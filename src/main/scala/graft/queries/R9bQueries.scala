package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Selection, TextAnalysis}

/** Round-9 second continuation wave: the destructive half of substring
  * dedup (span REMOVAL, where `dedup_span_exact` only measures), plus
  * deterministic weighted selection and resampled-uncertainty operators —
  * integer/string-exact end to end so every key hash-matches the DuckDB
  * oracle under any partitioning.
  */
object R9bQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Exact-substring-dedup removal over the planted duplicate corpus
    * (keep-first across AND within documents): per doc the token total,
    * removed-token count, maximal-island count, and the md5 of the rebuilt
    * text. Exact copies lose everything (clean_md5 = md5('')); suffixed
    * twins keep only the tail their suffix un-duplicates. */
  private val corpusSpanClean: Q = (s, dir) =>
    Dedup.spanClean(ExtQueries.dupCorpus(s, dir)).orderBy("doc_id")

  /** Exact-size weighted draw: systematic PPS over the md5-fold hash
    * order, weights = n_chars, k = 100 grid points — Σhits is exactly k
    * and every doc's hits ∈ {⌊wk/W⌋, ⌈wk/W⌉}. */
  private val corpusPpsSample: Q = (s, dir) =>
    Selection.ppsSample(Synth.documents(s, dir)).orderBy("doc_id")

  /** Percentile-bootstrap 95% CI of mean n_chars, 200 deterministic
    * Poisson replicates hashed from (doc_id, replicate). */
  private val corpusBootstrapCi: Q = (s, dir) =>
    Selection.bootstrapCi(Synth.documents(s, dir))

  /** Per-doc integer Flesch reading ease — the readability curation signal. */
  private val textReadability: Q = (s, dir) =>
    TextAnalysis.readability(Synth.documents(s, dir)).orderBy("doc_id")

  def queries: Map[String, Q] = Map(
    "corpus_span_clean" -> corpusSpanClean,
    "corpus_pps_sample" -> corpusPpsSample,
    "corpus_bootstrap_ci" -> corpusBootstrapCi,
    "text_readability" -> textReadability)

  private val SpanCleanOracle: String =
    s"""${ExtQueries.CorpusCte},
       |tok AS MATERIALIZED (
       |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM corpus),
       |tr AS MATERIALIZED (
       |  SELECT doc_id, unnest(range(0, len(t))) AS pos, unnest(t) AS tok
       |  FROM tok),
       |occ AS MATERIALIZED (
       |  SELECT doc_id, s * 4 AS start,
       |    md5(array_to_string(t[s*4+1 : s*4+8], ' ')) AS sh
       |  FROM (SELECT doc_id, t, unnest(range(0, (len(t)-8)//4 + 1)) AS s
       |        FROM tok WHERE len(t) >= 8)),
       |marked AS MATERIALIZED (
       |  SELECT doc_id, start,
       |    count(*) OVER (PARTITION BY sh) AS cnt,
       |    row_number() OVER (PARTITION BY sh ORDER BY doc_id, start) AS rn
       |  FROM occ),
       |rem AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, unnest(range(start, start + 8)) AS pos
       |  FROM marked WHERE cnt > 1 AND rn > 1),
       |isl AS (
       |  SELECT doc_id, count(*) AS removed_tokens,
       |    sum(CASE WHEN prev IS NULL OR pos - prev > 1 THEN 1 ELSE 0 END)
       |      AS n_islands
       |  FROM (SELECT doc_id, pos,
       |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |        FROM rem)
       |  GROUP BY doc_id),
       |clean AS (
       |  SELECT tr.doc_id, md5(string_agg(tr.tok, ' ' ORDER BY tr.pos))
       |    AS clean_md5
       |  FROM tr LEFT JOIN rem ON rem.doc_id = tr.doc_id AND rem.pos = tr.pos
       |  WHERE rem.pos IS NULL GROUP BY tr.doc_id)
       |SELECT k.doc_id, CAST(len(k.t) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(i.removed_tokens, 0) AS BIGINT) AS removed_tokens,
       |  CAST(coalesce(i.n_islands, 0) AS BIGINT) AS n_islands,
       |  coalesce(c.clean_md5, md5('')) AS clean_md5
       |FROM tok k LEFT JOIN isl i USING (doc_id)
       |           LEFT JOIN clean c USING (doc_id)
       |ORDER BY k.doc_id""".stripMargin

  /** Single-ordered-window twin of the banded Spark plan: the global
    * cumulative weight line, grid membership by the same integer formula. */
  private val PpsOracle: String =
    s"""WITH hs AS (SELECT doc_id, n_chars AS w, md5(text) AS hx FROM documents),
       |hh AS (SELECT doc_id, w, ${ExtQueries.hexFoldSql(1, 15)} AS h FROM hs),
       |t AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM hh),
       |c AS (SELECT doc_id, w, sum(w) OVER (ORDER BY h, doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ci FROM hh)
       |SELECT doc_id, CAST(w AS BIGINT) AS weight,
       |  CAST((2*ci*100 + wt) // (2*wt) - (2*(ci-w)*100 + wt) // (2*wt)
       |    AS BIGINT) AS hits
       |FROM c, t
       |WHERE (2*ci*100 + wt) // (2*wt) > (2*(ci-w)*100 + wt) // (2*wt)
       |ORDER BY doc_id""".stripMargin

  /** Replays the hashed Poisson counts with the SAME threshold literals
    * ([[Selection.PoissonThresholds]]) — parity by construction. */
  private val BootstrapOracle: String = {
    val cases = Selection.PoissonThresholds.zipWithIndex
      .map { case (thr, j) => s"WHEN u < $thr THEN $j" }.mkString(" ")
    s"""WITH reps AS (SELECT doc_id, n_chars, unnest(range(0, 200)) AS b
       |  FROM documents),
       |hs AS (SELECT n_chars, b, md5(doc_id || '_' || b) AS hx FROM reps),
       |uu AS (SELECT n_chars, b, ${ExtQueries.hexFoldSql(1, 15)} AS u FROM hs),
       |cc AS (SELECT b, n_chars, CASE $cases ELSE 9 END AS c FROM uu),
       |m AS (SELECT b, 10000 * sum(c * n_chars) // sum(c) AS m
       |      FROM cc GROUP BY b),
       |r AS (SELECT m, row_number() OVER (ORDER BY m) AS rn FROM m)
       |SELECT
       |  CAST((SELECT 10000 * sum(n_chars) // count(*) FROM documents)
       |    AS BIGINT) AS mean_x10000,
       |  CAST((SELECT m FROM r WHERE rn = 5) AS BIGINT) AS lo_x10000,
       |  CAST((SELECT m FROM r WHERE rn = 196) AS BIGINT) AS hi_x10000,
       |  CAST(200 AS BIGINT) AS n_reps""".stripMargin
  }

  private val ReadabilityOracle: String =
    """SELECT doc_id,
      |  CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS words,
      |  CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
      |    AS sentences,
      |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
      |    AS syllables,
      |  CAST(206835
      |    - 1015 * ((1000 * len(regexp_split_to_array(text, '\s+')))
      |        // greatest(len(regexp_extract_all(text, '[.!?]+')), 1)) // 1000
      |    - 84600 * ((1000 * len(regexp_extract_all(lower(text), '[aeiouy]+')))
      |        // len(regexp_split_to_array(text, '\s+'))) // 1000
      |    AS BIGINT) AS flesch_x1000
      |FROM documents ORDER BY doc_id""".stripMargin

  def oracle: Map[String, String] = Map(
    "corpus_span_clean" -> SpanCleanOracle,
    "corpus_pps_sample" -> PpsOracle,
    "corpus_bootstrap_ci" -> BootstrapOracle,
    "text_readability" -> ReadabilityOracle)
}
