package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Selection}

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

  def queries: Map[String, Q] = Map(
    "corpus_span_clean" -> corpusSpanClean,
    "corpus_pps_sample" -> corpusPpsSample)

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

  def oracle: Map[String, String] = Map(
    "corpus_span_clean" -> SpanCleanOracle,
    "corpus_pps_sample" -> PpsOracle)
}
