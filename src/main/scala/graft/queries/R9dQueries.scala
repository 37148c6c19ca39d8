package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

/** Round-9 fourth continuation wave.
  *
  * Completes the adapted TPC-H suite (Q4/Q9/Q12 were the last gaps — with
  * these, all 22 benchmark plan shapes are oracle-checked keys) and adds a
  * per-user Markov transition matrix over the events stream (the
  * event-sequence analytics shape: one user-partitioned window + one
  * pair-keyed aggregate).
  *
  * Adaptation notes (same contract as [[R9cQueries]]: keep the PLAN SHAPE,
  * swap the columns the simplified testdata lacks):
  *   - Q4's `l_commitdate < l_receiptdate` lateness predicate becomes
  *     "shipped more than 30 days after the order date" — the EXISTS still
  *     correlates on BOTH the join key and an outer non-equi column, which
  *     is the entire point of Q4 (a semi-join whose condition references
  *     the outer row beyond the key).
  *   - Q9 has no partsupp/ps_supplycost: unit cost is the synthetic
  *     0.6 × p_retailprice. The 5-table join tree (fact ⋈ part ⋈ supplier
  *     ⋈ nation ⋈ orders) and the (nation, year) rollup — Q9's defining
  *     shape, the widest join in the benchmark — survive unchanged.
  *   - Q12 has no l_shipmode/commit/receipt dates: l_linestatus stands in
  *     for the mode axis and the lateness predicate is ship > order + 60d;
  *     the conditional-aggregation-over-join shape is what Q12 is for.
  *
  * Money rule (from the session-3 wave): exact DECIMAL(18,6) sums under
  * any partitioning; doubles re-entered in ONE pinned final expression.
  */
object R9dQueries {
  import Synth._

  type Q = (SparkSession, String) => DataFrame

  /** Same stable-view front door as [[R9cQueries.views]], plus nation and
    * region. */
  private def views(s: SparkSession, dir: String): Unit = {
    lineitem(s, dir).createOrReplaceTempView("graft_td_lineitem")
    orders(s, dir).createOrReplaceTempView("graft_td_orders")
    s.read.parquet(s"$dir/supplier.parquet")
      .createOrReplaceTempView("graft_td_supplier")
    s.read.parquet(s"$dir/part.parquet")
      .createOrReplaceTempView("graft_td_part")
    s.read.parquet(s"$dir/nation.parquet")
      .createOrReplaceTempView("graft_td_nation")
    s.read.parquet(s"$dir/region.parquet")
      .createOrReplaceTempView("graft_td_region")
  }

  private def sqlQ(body: String): Q = (s, dir) => {
    views(s, dir)
    s.sql(body)
  }

  /** TPC-H Q4 (order-priority checking), adapted: orders placed in 1996Q2
    * with at least one line shipped >30 days after the order date. The
    * EXISTS correlates on l_orderkey = o_orderkey AND the non-equi
    * l_shipdate > o_orderdate + 30d — Catalyst decorrelates to ONE left
    * semi join carrying both conditions (no per-row re-execution), which
    * the plan spec pins. */
  private val q4OrderPriority: Q = sqlQ("""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM graft_td_orders
    WHERE o_orderdate >= TIMESTAMP '1996-04-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM graft_td_lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority""")

  /** TPC-H Q9 (product-type profit), adapted: profit = revenue − synthetic
    * unit cost (0.6 × p_retailprice) × quantity, for parts named like
    * '%ol%' (the '%green%' stand-in, ~37% selective), rolled up by
    * (nation, order year). At scale: part/supplier/nation broadcast; the
    * only fact-sized exchanges are the lineitem⋈orders join and the final
    * (nation, year) aggregate — both partial-aggregated map-side. */
  private val q9ProductProfit: Q = sqlQ("""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST((l_extendedprice * (1 - l_discount))
                         - ((p_retailprice * 0.6) * l_quantity)
                    AS DECIMAL(18,6))) AS DOUBLE) AS profit
    FROM graft_td_lineitem
    JOIN graft_td_part ON p_partkey = l_partkey
    JOIN graft_td_supplier ON s_suppkey = l_suppkey
    JOIN graft_td_nation ON n_nationkey = s_nationkey
    JOIN graft_td_orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%ol%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC""")

  /** TPC-H Q12 (shipping modes and order priority), adapted: lines shipped
    * in 1996 more than 60 days after their order date, split by
    * l_linestatus into high/low-priority conditional counts. */
  private val q12ShipmodePriority: Q = sqlQ("""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM graft_td_orders JOIN graft_td_lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus ORDER BY l_linestatus""")

  /** Per-user event-type transition matrix (the first-order Markov view of
    * the event stream): next event per user via ONE user-partitioned
    * window ordered by (ts, event_id), then a (src, dst)-keyed count.
    * Counts stay integers — the transition probabilities are a trivial
    * downstream division the caller re-enters doubles with; keeping the
    * key integral makes it exact under any partitioning. Scale: the window
    * partitions by user_id (high-cardinality), the aggregate's key space is
    * |event_type|² — both shuffles are healthy. */
  private val qMarkovTransitions: Q = (s, dir) =>
    eventsTs(s, dir)
      .withColumn("dst", lead("event_type", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts_us", "event_id")))
      .filter(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
      .orderBy("src", "dst")

  /** MOSS-style winnowing-overlap near-dup pairs —
    * [[graft.ext.Dedup.winnowingPairs]]. */
  private val dedupWinnowing: Q = (s, dir) =>
    graft.ext.Dedup.winnowingPairs(documents(s, dir))
      .orderBy("doc_a", "doc_b")

  /** Complete-dedup e2e over the winnowing pairs: fingerprint-overlap
    * candidates → connected components → one canonical doc per cluster +
    * every unpaired doc (the third keep-canonical rung next to the LSH
    * and exact-Jaccard-prefix variants). */
  private val dedupKeepCanonicalWinnowing: Q = (s, dir) => {
    val docs = documents(s, dir)
    graft.ext.Dedup.keepCanonical(docs,
      graft.ext.Dedup.winnowingPairs(docs)
        .select(col("doc_a").as("ida"), col("doc_b").as("idb")))
      .orderBy("doc_id")
  }

  /** Ratio-to-parent — the OLAP drill-down share metric: each nation's
    * revenue as a fraction of its region's, entirely in integers.
    * Revenue sums are exact DECIMAL(18,6), FLOORED to whole-unit BIGINTs
    * (explicit floor — a bare decimal→long cast truncates in Spark but
    * rounds in DuckDB), and the share is one integer division ×10⁴ — no
    * decimal division (whose rounding differs across engines) anywhere;
    * rev·10⁴ stays under 2⁶³ past sf100. Shape: one fact aggregate to
    * nation grain, a 25-row parent rollup, one broadcast join back — the
    * parent total is never a global window. */
  private val qShareOfParent: Q = sqlQ("""
    WITH nat AS (
      SELECT n_regionkey, n_name,
             CAST(floor(sum(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(18,6)))) AS BIGINT) AS rev_f
      FROM graft_td_lineitem
      JOIN graft_td_supplier ON s_suppkey = l_suppkey
      JOIN graft_td_nation ON n_nationkey = s_nationkey
      GROUP BY 1, 2),
    reg AS (
      SELECT n_regionkey, CAST(sum(rev_f) AS BIGINT) AS region_f
      FROM nat GROUP BY 1)
    SELECT r_name AS region, n_name AS nation, rev_f,
           (rev_f * 10000) div region_f AS share_x10000
    FROM nat
    JOIN reg USING (n_regionkey)
    JOIN graft_td_region ON r_regionkey = n_regionkey
    ORDER BY region, nation""")

  /** Measured recall of the winnowing candidate generator on the planted
    * duplicate corpus (the self-grading discipline of dedup_recall /
    * ann_recall applied to the winnowing rung): of the planted suffixed
    * near-dups (+1e6) and exact copies (+2e6), how many appear in at
    * least one winnowing pair? */
  private val dedupWinnowingRecall: Q = (s, dir) => {
    val c = ExtQueries.dupCorpus(s, dir)
    val planted = c.filter(col("doc_id") >= 100000000).select("doc_id")
    val wp = graft.ext.Dedup.winnowingPairs(c)
    val det = wp.select(col("doc_a").as("doc_id"))
      .unionAll(wp.select(col("doc_b").as("doc_id"))).distinct()
    planted.agg(count(lit(1)).as("planted"))
      .crossJoin(planted.join(det, "doc_id")
        .agg(count(lit(1)).as("detected")))
  }

  /** Seasonal-naive forecast evaluation over the events stream: per
    * event type, daily exact-decimal volume; forecast(day) =
    * actual(day − 7); MAE over forecastable days. The lag is an equi
    * self-join on (event_type, day − 7) — never an ordered window, so
    * calendar gaps can't silently shift the season and the join
    * partitions healthily at scale. Doubles re-enter in ONE final
    * division. */
  private val qSeasonalNaiveMae: Q = (s, dir) => {
    eventsTs(s, dir).createOrReplaceTempView("graft_sn_events")
    s.sql("""
      WITH daily AS (
        SELECT event_type, ts_us div 86400000000 AS day,
               sum(CAST(value AS DECIMAL(18,6))) AS v
        FROM graft_sn_events GROUP BY 1, 2)
      SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(abs(a.v - b.v)) AS DOUBLE) / count(*) AS mae
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day = b.day + 7
      GROUP BY a.event_type ORDER BY a.event_type""")
  }

  /** Hard-negative mining — [[graft.ext.Similarity.hardNegatives]]. */
  private val annHardNegatives: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    graft.ext.Similarity.hardNegatives(e, e.filter(col("vec_id") < 10), 5)
      .orderBy("q_id", "rank")
  }

  /** MMR diversified retrieval — [[graft.ext.Similarity.mmrDiversify]]. */
  private val annMmrDiversify: Q = (s, dir) => {
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = embeddings(s, dir)
    graft.ext.Similarity.mmrDiversify(e, e.filter(col("vec_id") < 10))
      .orderBy("q_id", "sel_rank")
  }

  val queries: Map[String, Q] = Map(
    "q4_order_priority" -> q4OrderPriority,
    "q9_product_profit" -> q9ProductProfit,
    "q12_shipmode_priority" -> q12ShipmodePriority,
    "q_markov_transitions" -> qMarkovTransitions,
    "dedup_winnowing" -> dedupWinnowing,
    "dedup_keep_canonical_winnowing" -> dedupKeepCanonicalWinnowing,
    "dedup_winnowing_recall" -> dedupWinnowingRecall,
    "q_seasonal_naive_mae" -> qSeasonalNaiveMae,
    "q_share_of_parent" -> qShareOfParent,
    "ann_hard_negatives" -> annHardNegatives,
    "ann_mmr_diversify" -> annMmrDiversify,
    "text_char_diversity" -> ((s, dir) =>
      TextAnalysis.charDiversity(documents(s, dir)).orderBy("doc_id")))

  /** One unrolled MMR round: pick the argmax of
    * 0.7·sim − 0.3·max_{s∈selcum} cos(c,s) among unselected candidates,
    * ties (score desc, n_id asc) via DuckDB struct-max — the exact twin
    * of the Spark round. */
  private def mmrRound(r: Int): String = {
    val prev = s"selcum${r - 1}"
    s"""pick$r AS MATERIALIZED (
       |  SELECT q_id, (m).nid AS n_id, (m).psim AS sim, (m).s AS mmr,
       |         $r AS sel_rank
       |  FROM (
       |    SELECT c.q_id,
       |      max({'s': CAST(0.7 AS DOUBLE) * c.sim
       |                - CAST(0.3 AS DOUBLE) * ms.msim,
       |           'n': -c.n_id, 'nid': c.n_id, 'psim': c.sim}) AS m
       |    FROM cand c
       |    JOIN (SELECT cc.q_id, cc.i AS n_id, max(cc.cs) AS msim
       |          FROM cc JOIN $prev s
       |            ON cc.q_id = s.q_id AND cc.j = s.n_id
       |          GROUP BY 1, 2) ms
       |      ON ms.q_id = c.q_id AND ms.n_id = c.n_id
       |    WHERE NOT EXISTS (SELECT 1 FROM $prev s
       |                      WHERE s.q_id = c.q_id AND s.n_id = c.n_id)
       |    GROUP BY c.q_id)),
       |selcum$r AS MATERIALIZED (
       |  SELECT * FROM $prev UNION ALL SELECT * FROM pick$r)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q4_order_priority" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-04-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       CAST(sum(CAST((l_extendedprice * (1 - l_discount))
        |                     - ((p_retailprice * 0.6) * l_quantity)
        |                AS DECIMAL(18,6))) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |WHERE p_name LIKE '%ol%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q12_shipmode_priority" ->
      """SELECT l_linestatus,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "ann_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe, label AS ql
         |           FROM embeddings WHERE vec_id < 10),
         |scored AS (SELECT q_id, e.vec_id AS n_id,
         |  ${ExtQueries.cosSql("qe", "e.embedding")} AS sim
         |  FROM embeddings e, q
         |  WHERE e.vec_id <> q.q_id AND e.label <> q.ql),
         |ranked AS (SELECT q_id, n_id, sim,
         |  CAST(row_number() OVER (PARTITION BY q_id
         |       ORDER BY sim DESC, n_id) AS INT) AS rank
         |  FROM scored)
         |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    "ann_mmr_diversify" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe
         |           FROM embeddings WHERE vec_id < 10),
         |scored AS (SELECT q_id, e.vec_id AS n_id,
         |    ${ExtQueries.cosSql("qe", "e.embedding")} AS sim
         |  FROM embeddings e, q WHERE e.vec_id <> q.q_id),
         |cand AS MATERIALIZED (
         |  SELECT q_id, n_id, sim FROM (
         |    SELECT q_id, n_id, sim,
         |      row_number() OVER (PARTITION BY q_id
         |        ORDER BY sim DESC, n_id) AS rn
         |    FROM scored) WHERE rn <= 12),
         |cc AS MATERIALIZED (
         |  SELECT a.q_id, a.n_id AS i, b.n_id AS j,
         |    ${ExtQueries.cosSql("ea.embedding", "eb.embedding")} AS cs
         |  FROM cand a
         |  JOIN cand b ON a.q_id = b.q_id AND a.n_id <> b.n_id
         |  JOIN embeddings ea ON ea.vec_id = a.n_id
         |  JOIN embeddings eb ON eb.vec_id = b.n_id),
         |selcum1 AS MATERIALIZED (
         |  SELECT q_id, n_id, sim, CAST(0.7 AS DOUBLE) * sim AS mmr,
         |         1 AS sel_rank
         |  FROM (SELECT q_id, n_id, sim,
         |          row_number() OVER (PARTITION BY q_id
         |            ORDER BY sim DESC, n_id) AS rn
         |        FROM cand) WHERE rn = 1),
         |${(2 to 5).map(mmrRound).mkString(",\n")}
         |SELECT q_id, CAST(sel_rank AS INT) AS sel_rank, n_id, sim, mmr
         |FROM selcum5 ORDER BY q_id, sel_rank""".stripMargin,

    "dedup_winnowing" ->
      s"""WITH ${R9cQueries.winnowingSelCtes("documents")},
         |fp AS (SELECT DISTINCT doc_id, h FROM sel),
         |elig AS (
         |  SELECT doc_id, h FROM fp
         |  WHERE h IN (SELECT h FROM fp GROUP BY h HAVING count(*) <= 64)),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         CAST(count(*) AS BIGINT) AS shared
         |  FROM elig a JOIN elig b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= 3),
         |sizes AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM fp GROUP BY 1)
         |SELECT doc_a, doc_b, shared, sa.n AS n_a, sb.n AS n_b
         |FROM pairs
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |ORDER BY doc_a, doc_b""".stripMargin,

    // same transitive-closure recursion as dedup_keep_canonical_prefix,
    // fed by the winnowing pair chain
    "dedup_keep_canonical_winnowing" ->
      s"""WITH RECURSIVE ${R9cQueries.winnowingSelCtes("documents")},
         |fp AS (SELECT DISTINCT doc_id, h FROM sel),
         |elig AS (
         |  SELECT doc_id, h FROM fp
         |  WHERE h IN (SELECT h FROM fp GROUP BY h HAVING count(*) <= 64)),
         |wpairs AS (
         |  SELECT a.doc_id AS ida, b.doc_id AS idb
         |  FROM elig a JOIN elig b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= 3),
         |edges AS (SELECT ida AS a, idb AS b FROM wpairs
         |          UNION SELECT idb, ida FROM wpairs),
         |verts AS (SELECT DISTINCT a AS v FROM edges),
         |reach(v, r) AS (
         |  SELECT v, v FROM verts
         |  UNION
         |  SELECT reach.v, e.b FROM reach JOIN edges e ON reach.r = e.a),
         |comp AS (SELECT v AS doc_id, min(r) AS comp FROM reach GROUP BY 1)
         |SELECT d.doc_id, CAST(coalesce(c.comp, d.doc_id) AS BIGINT) AS cluster
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
         |WHERE c.comp IS NULL OR c.comp = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // same pair chain over the planted-dup corpus; recall = planted ids
    // appearing in >= 1 pair
    "dedup_winnowing_recall" ->
      s"""${ExtQueries.CorpusCte},
         |${R9cQueries.winnowingSelCtes("corpus")},
         |fp AS (SELECT DISTINCT doc_id, h FROM sel),
         |elig AS (
         |  SELECT doc_id, h FROM fp
         |  WHERE h IN (SELECT h FROM fp GROUP BY h HAVING count(*) <= 64)),
         |wpairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM elig a JOIN elig b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= 3),
         |planted AS (SELECT doc_id FROM corpus WHERE doc_id >= 100000000),
         |det AS (SELECT DISTINCT doc_id FROM (
         |  SELECT doc_a AS doc_id FROM wpairs
         |  UNION ALL SELECT doc_b FROM wpairs))
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM planted) AS planted,
         |       (SELECT CAST(count(*) AS BIGINT)
         |        FROM planted JOIN det USING (doc_id)) AS detected""".stripMargin,

    "q_share_of_parent" ->
      """WITH nat AS (
        |  SELECT n_regionkey, n_name,
        |         CAST(floor(sum(CAST(l_extendedprice * (1 - l_discount)
        |                  AS DECIMAL(18,6)))) AS BIGINT) AS rev_f
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  GROUP BY 1, 2),
        |reg AS (
        |  SELECT n_regionkey, CAST(sum(rev_f) AS BIGINT) AS region_f
        |  FROM nat GROUP BY 1)
        |SELECT r_name AS region, n_name AS nation, rev_f,
        |       (rev_f * 10000) // region_f AS share_x10000
        |FROM nat
        |JOIN reg USING (n_regionkey)
        |JOIN region ON r_regionkey = n_regionkey
        |ORDER BY region, nation""".stripMargin,

    "q_seasonal_naive_mae" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         sum(CAST(value AS DECIMAL(18,6))) AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(sum(abs(a.v - b.v)) AS DOUBLE) / count(*) AS mae
        |FROM daily a JOIN daily b
        |  ON a.event_type = b.event_type AND a.day = b.day + 7
        |GROUP BY a.event_type ORDER BY a.event_type""".stripMargin,

    "text_char_diversity" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM documents),
        |hist AS (
        |  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        |  FROM ch WHERE ch <> '' GROUP BY 1, 2),
        |agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
        |         CAST(count(*) AS BIGINT) AS distinct_chars,
        |         CAST(sum(c * (c - 1)) AS BIGINT) AS coll_num
        |  FROM hist GROUP BY 1)
        |SELECT doc_id, n, distinct_chars, coll_num,
        |       n * (n - 1) AS coll_den,
        |       CASE WHEN n >= 2 THEN
        |         ((n * (n - 1) - coll_num) * 1000000) // (n * (n - 1))
        |       END AS diversity_x1e6
        |FROM agg ORDER BY doc_id""".stripMargin,

    "q_markov_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY epoch_us(ts), event_id)
        |           AS dst
        |  FROM events)
        |SELECT event_type AS src, dst, CAST(count(*) AS BIGINT) AS n
        |FROM seq WHERE dst IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
