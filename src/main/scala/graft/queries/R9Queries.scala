package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextAnalysis}

/** Round-9 continuation wave: the deterministic-complete complement of the
  * probabilistic dedup family (prefix-filter exact-Jaccard join), the
  * insertion-robust complement of fixed-stride span dedup (content-defined
  * chunking), and sparse retrieval (integer-exact BM25) — three curation
  * operators the LSH/minhash rungs don't cover.
  */
object R9Queries {
  import Synth._

  type Q = (SparkSession, String) => DataFrame

  /** PPJoin-family prefix-filter self-join at Jaccard ≥ 0.6 over 3-shingle
    * sets — COMPLETE (every qualifying pair is emitted; no LSH miss
    * probability), still never all-pairs. */
  private val dedupJaccardPrefix: Q = (s, dir) =>
    Dedup.prefixFilterPairs(documents(s, dir)).orderBy("ida", "idb")

  /** Gear/FastCDC chunk-level dedup on the planted corpus (exact copies →
    * fully duplicated chunk sets; suffixed twins → all-but-the-tail
    * duplicated — the chunk-level view whole-document dedup misses). */
  private val dedupCdcChunks: Q = (s, dir) =>
    Dedup.cdcChunkStats(ExtQueries.dupCorpus(s, dir)).orderBy("doc_id")

  /** BM25 top-10 for the deterministic doc-0 probe query. */
  private val textBm25Topk: Q = (s, dir) =>
    TextAnalysis.bm25TopK(documents(s, dir))

  /** HDR-style log-histogram quantile sketch (p50/p95/p99 of event value
    * per type) — the quantile member of the sketch family (KMV/HLL/CMS
    * cover cardinality, frequency, top-k). Deterministic and exactly
    * mergeable where GK is order-dependent and KLL randomized: state is a
    * (bucket → count) map, buckets are value-monotone integer codes —
    * exact for v_µs < 32, else 16·ilog2(v) + the next 4 mantissa bits
    * (relative error ≤ 2⁻⁴). Quantile = lower bound of the first bucket
    * whose cumulative count reaches ⌈q·n/100⌉ — pure integer arithmetic,
    * bit-equal in any engine and under any merge order.
    *
    * Scale shape: one map-side-combined (group, bucket) count — the only
    * corpus-sized pass; the cumulative walk runs in a group-partitioned
    * window over ≤ 16·63 bucket rows per group. [[graft.streaming
    * .QuantileHistStream]] maintains the same state online (parity
    * spec-pinned). */
  private val sketchQuantileHistogram: Q = (s, dir) => {
    val bk = events(s, dir)
      .select(col("event_type"),
        greatest(lit(1L), floor(col("value") * 1000000).cast("long")).as("vq"))
      .withColumn("e", (length(bin(col("vq"))) - 1).cast("long"))
      .withColumn("bucket", expr(
        "CASE WHEN vq < 32 THEN vq ELSE 16*e + (shiftright(vq, CAST(e-4 AS INT)) & 15) END"))
    val counts = bk.groupBy("event_type", "bucket").agg(count(lit(1)).as("c"))
    val cum = counts
      .withColumn("cum",
        sum("c").over(Window.partitionBy("event_type").orderBy("bucket")))
      .withColumn("n", sum("c").over(Window.partitionBy("event_type")))
    def pick(q: Int) =
      min(when(col("cum") >= expr(s"($q*n + 99) div 100"), col("bucket")))
    def lower(name: String) = expr(
      s"CASE WHEN $name < 32 THEN $name " +
        s"ELSE shiftleft(16 + $name % 16, CAST($name div 16 - 4 AS INT)) END")
    cum.groupBy("event_type")
      .agg(max("n").as("n"), pick(50).as("b50"), pick(95).as("b95"),
        pick(99).as("b99"))
      .select(col("event_type"), col("n"),
        lower("b50").as("p50_us"), lower("b95").as("p95_us"),
        lower("b99").as("p99_us"))
      .orderBy("event_type")
  }

  /** Keep-first removal of cross-doc duplicated CDC chunks; exact copies
    * clean to '' (their owner keeps everything), suffix twins keep only
    * their unique tail. */
  private val corpusCdcClean: Q = (s, dir) =>
    Dedup.cdcClean(ExtQueries.dupCorpus(s, dir)).orderBy("doc_id")

  val queries: Map[String, Q] = Map(
    "dedup_jaccard_prefix" -> dedupJaccardPrefix,
    "dedup_cdc_chunks" -> dedupCdcChunks,
    "corpus_cdc_clean" -> corpusCdcClean,
    "text_bm25_topk" -> textBm25Topk,
    "sketch_quantile_histogram" -> sketchQuantileHistogram)

  /** DuckDB twin of graft.ext hex-fold mod 16 applied to md5(w): the gear
    * value g(w). */
  private val GearSql: String =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(range(1, 16), j -> " +
      "CAST(strpos('0123456789abcdef', substr(md5(w), CAST(j AS INT), 1)) - 1 AS BIGINT))), " +
      "(x,y) -> x*16 + y) % 16"

  private val ShingleListSql: String =
    """CASE WHEN len(t) < 3 THEN []::VARCHAR[]
      |     ELSE list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |END""".stripMargin

  /** Shared CDC chain: planted corpus → (doc_id, cid, chunk). */
  private lazy val CdcChunksCtes: String =
    s"""${ExtQueries.CorpusCte},
       |tok AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM corpus),
       |tp AS (SELECT doc_id, unnest(t) AS w, unnest(range(1, len(t)+1)) AS pos FROM tok),
       |gs AS (SELECT doc_id, pos, w, $GearSql AS g FROM tp),
       |fl AS (SELECT doc_id, pos, w,
       |    CASE WHEN pos >= 4 AND (g + 2*lag(g,1) OVER w1 + 4*lag(g,2) OVER w1
       |                            + 8*lag(g,3) OVER w1) % 16 = 0
       |         THEN 1 ELSE 0 END AS b
       |  FROM gs WINDOW w1 AS (PARTITION BY doc_id ORDER BY pos)),
       |cum AS (SELECT doc_id, pos, w,
       |    sum(b) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - b AS cid
       |  FROM fl),
       |chunks AS (SELECT doc_id, cid, string_agg(w, ' ' ORDER BY pos) AS chunk
       |  FROM cum GROUP BY doc_id, cid)""".stripMargin

  val oracle: Map[String, String] = Map(
    // the same global rarity order realized the window way: row_number
    // over (df, shingle) replays sort_array(struct(df, w)); prefix length,
    // length filter and threshold are the identical integer expressions
    "dedup_jaccard_prefix" ->
      s"""WITH tok AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM documents),
         |sh AS (SELECT doc_id, list_distinct($ShingleListSql) AS s FROM tok),
         |tokx AS (SELECT doc_id, len(s) AS sz, unnest(s) AS w FROM sh),
         |df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tokx GROUP BY w),
         |ordered AS (SELECT doc_id, w, sz,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY df.df, w) AS rn
         |  FROM tokx JOIN df USING (w)),
         |pref AS (SELECT doc_id, w, sz FROM ordered
         |  WHERE rn <= sz - ((6*sz + 9)//10) + 1),
         |cand AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
         |  FROM pref a JOIN pref b ON a.w = b.w AND a.doc_id < b.doc_id
         |  WHERE 6*greatest(a.sz, b.sz) <= 10*least(a.sz, b.sz)),
         |ver AS (SELECT ida, idb,
         |    len(list_intersect(x.s, y.s)) AS inter,
         |    len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)) AS uni
         |  FROM cand JOIN sh x ON x.doc_id = ida JOIN sh y ON y.doc_id = idb)
         |SELECT ida, idb, CAST(10000 * inter // uni AS BIGINT) AS jacc_x10000
         |FROM ver WHERE 10*inter >= 6*uni ORDER BY ida, idb""".stripMargin,

    // the sequential window-function realization of the same position-local
    // boundary rule: lag() rebuilds the 4-token gear window, a cumulative
    // sum numbers chunks, string_agg(ORDER BY pos) rebuilds chunk text
    "dedup_cdc_chunks" ->
      s"""$CdcChunksCtes,
         |ch AS (SELECT doc_id, md5(chunk) AS h, CAST(count(*) AS BIGINT) AS occ
         |  FROM chunks GROUP BY doc_id, md5(chunk)),
         |dup AS (SELECT h FROM (SELECT h, count(*) AS nd FROM ch GROUP BY h) WHERE nd > 1),
         |per AS (SELECT doc_id, sum(occ) AS chunks FROM ch GROUP BY doc_id),
         |dupper AS (SELECT doc_id, sum(occ) AS dup_chunks FROM ch
         |  WHERE h IN (SELECT h FROM dup) GROUP BY doc_id)
         |SELECT per.doc_id, CAST(chunks AS BIGINT) AS chunks,
         |  CAST(coalesce(dup_chunks, 0) AS BIGINT) AS dup_chunks,
         |  CAST(coalesce(10000 * dup_chunks // chunks, 0) AS BIGINT) AS dup_x10000
         |FROM per LEFT JOIN dupper USING (doc_id) ORDER BY per.doc_id""".stripMargin,

    // keep-first ownership over the same chunk chain; string_agg skips the
    // NULLed-out removed chunks exactly like the Spark side's struct filter
    "corpus_cdc_clean" ->
      s"""$CdcChunksCtes,
         |inst AS (SELECT doc_id, cid, chunk, md5(chunk) AS h FROM chunks),
         |own AS (SELECT h, min(doc_id) AS owner, count(DISTINCT doc_id) AS nd
         |  FROM inst GROUP BY h)
         |SELECT doc_id,
         |  CAST(sum(CASE WHEN nd = 1 OR doc_id = owner THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN nd = 1 OR doc_id = owner THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
         |  coalesce(string_agg(CASE WHEN nd = 1 OR doc_id = owner THEN chunk END,
         |    ' ' ORDER BY cid), '') AS clean_text
         |FROM inst JOIN own USING (h)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // identical integer BM25: idf_bits via bin-length ilog2, the
    // denominators-cleared saturation fraction, one integer division per
    // term, (score desc, doc_id) tie-break
    "text_bm25_topk" ->
      s"""WITH tok AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM documents),
         |sh AS (SELECT doc_id, $ShingleListSql AS sg FROM tok),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(len(sg)) AS BIGINT) AS tt FROM sh),
         |q AS (SELECT unnest(list_sort(list_distinct(sg))[1:5]) AS w FROM sh WHERE doc_id = 0),
         |tfd AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf, CAST(max(dl) AS BIGINT) AS dl
         |  FROM (SELECT doc_id, unnest(sg) AS w, len(sg) AS dl FROM sh) x
         |  JOIN q USING (w) GROUP BY doc_id, w),
         |dfq AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tfd GROUP BY w),
         |sc AS (SELECT doc_id,
         |    sum(((strlen(bin(n)) - 1) - (strlen(bin(df)) - 1)) *
         |        ((10000 * 22 * tt * tf) // (10 * tt * tf + 3 * tt + 9 * dl * n))) AS score_x10000
         |  FROM tfd JOIN dfq USING (w) CROSS JOIN st GROUP BY doc_id)
         |SELECT doc_id, CAST(score_x10000 AS BIGINT) AS score_x10000
         |FROM sc ORDER BY score_x10000 DESC, doc_id LIMIT 10""".stripMargin,

    // identical integer bucket code, cumulative walk, rank pick, and
    // lower-bound decode — the window runs over <= 16·63 bucket rows/group
    "sketch_quantile_histogram" ->
      """WITH b AS (SELECT event_type,
        |    greatest(1, CAST(floor(value * 1000000) AS BIGINT)) AS vq FROM events),
        |ee AS (SELECT event_type, vq, CAST(strlen(bin(vq)) - 1 AS BIGINT) AS e FROM b),
        |bk AS (SELECT event_type,
        |    CASE WHEN vq < 32 THEN vq
        |         ELSE 16*e + ((vq >> CAST(e-4 AS INT)) & 15) END AS bucket FROM ee),
        |c AS (SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS c
        |  FROM bk GROUP BY 1, 2),
        |cum AS (SELECT event_type, bucket, c,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY event_type) AS n FROM c),
        |agg AS (SELECT event_type, max(n) AS n,
        |    min(CASE WHEN cum >= (50*n + 99)//100 THEN bucket END) AS b50,
        |    min(CASE WHEN cum >= (95*n + 99)//100 THEN bucket END) AS b95,
        |    min(CASE WHEN cum >= (99*n + 99)//100 THEN bucket END) AS b99
        |  FROM cum GROUP BY event_type)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN b50 < 32 THEN b50
        |       ELSE (16 + b50 % 16) << CAST(b50//16 - 4 AS INT) END AS BIGINT) AS p50_us,
        |  CAST(CASE WHEN b95 < 32 THEN b95
        |       ELSE (16 + b95 % 16) << CAST(b95//16 - 4 AS INT) END AS BIGINT) AS p95_us,
        |  CAST(CASE WHEN b99 < 32 THEN b99
        |       ELSE (16 + b99 % 16) << CAST(b99//16 - 4 AS INT) END AS BIGINT) AS p99_us
        |FROM agg ORDER BY event_type""".stripMargin)
}
