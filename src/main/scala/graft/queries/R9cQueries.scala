package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

/** Round-9 third continuation wave: the TPC-H subquery suite, adapted.
  *
  * Round-9 session 3 stopped at Q7/8/10/14/15/18 and recorded
  * Q2/11/13/16/17/19/20/21/22 as "not expressible" on the simplified
  * testdata schema — true only of their LITERAL column lists (partsupp,
  * receipt/commit dates, phones, containers). Their defining PLAN
  * SHAPES — the reason those nine queries exist in the benchmark at
  * all — survive adaptation to the columns we do have (p_brand/p_size,
  * c_acctbal, o_orderstatus, l_returnflag, per-part supplier pairs from
  * lineitem itself):
  *
  *   - Q2  correlated scalar MIN over a derived per-(part,supplier)
  *          cost table → decorrelated aggregate + equi-join
  *   - Q11 HAVING against a scalar-subquery fraction of a global total
  *   - Q13 filtered LEFT OUTER join + double aggregation (distribution
  *          of per-customer counts, zeros included)
  *   - Q16 NOT IN subquery + count(DISTINCT) over fact-derived pairs
  *   - Q17 correlated scalar AVG against the FACT table itself
  *   - Q19 OR-of-conjunctions join predicate (disjunctive pushdown)
  *   - Q20 nested IN whose inner WHERE holds a correlated scalar SUM
  *   - Q21 EXISTS + NOT EXISTS self-joins on the fact table
  *   - Q22 scalar AVG threshold + NOT EXISTS anti-join
  *
  * Catalyst decorrelates every one of these into joins (no per-row
  * re-execution anywhere): scalar-agg subqueries become aggregate +
  * (broadcast) equi-joins, EXISTS/NOT EXISTS become semi/anti joins on
  * the correlation key. The money rule from the session-3 wave applies
  * unchanged: DECIMAL(18,6) sums (exact under any partitioning), doubles
  * re-entered in ONE pinned final expression; quantity averages are exact
  * because l_quantity is integral (checked: 0 non-integral rows).
  *
  * Plus `text_winnowing` — Schleimer/Wilkerson/Aiken (SIGMOD 2003)
  * winnowing fingerprints, the guaranteed-detection document sampler the
  * fingerprint family (text_fingerprint, dedup_ngram_jaccard) lacked;
  * see [[graft.ext.TextAnalysis.winnowingFingerprints]].
  */
object R9cQueries {
  import Synth._

  type Q = (SparkSession, String) => DataFrame

  /** Register the TPC-H-ish tables once per session under stable view
    * names (same front-door pattern as q_exists_subquery). */
  private def views(s: SparkSession, dir: String): Unit = {
    lineitem(s, dir).createOrReplaceTempView("graft_th_lineitem")
    orders(s, dir).createOrReplaceTempView("graft_th_orders")
    customer(s, dir).createOrReplaceTempView("graft_th_customer")
    s.read.parquet(s"$dir/supplier.parquet")
      .createOrReplaceTempView("graft_th_supplier")
    s.read.parquet(s"$dir/part.parquet")
      .createOrReplaceTempView("graft_th_part")
  }

  private def sqlQ(body: String): Q = (s, dir) => {
    views(s, dir)
    s.sql(body)
  }

  /** TPC-H Q2 (min-cost supplier), adapted: supply cost = the minimum
    * observed unit price per (part, supplier) in lineitem; the correlated
    * scalar MIN picks each part's cheapest supplier(s), ties surface. */
  private val q2MinCostSupplier: Q = sqlQ("""
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(l_extendedprice / l_quantity) AS cost
      FROM graft_th_lineitem GROUP BY 1, 2)
    SELECT p_partkey, s_suppkey, s_name, cost
    FROM graft_th_part
    JOIN ps ON p_partkey = partkey
    JOIN graft_th_supplier ON s_suppkey = suppkey
    WHERE p_type = 'STANDARD' AND p_size < 20
      AND cost = (SELECT min(ps2.cost) FROM ps ps2
                  WHERE ps2.partkey = p_partkey)
    ORDER BY p_partkey, s_suppkey""")

  /** TPC-H Q11 (important stock), adapted to per-part lineitem value:
    * parts whose exact-decimal value exceeds 1.25× the mean part value.
    * Q11's literal FRACTION-of-total threshold is scale-DEPENDENT by
    * design (the spec divides it by SF); a mean-relative threshold keeps
    * the same scalar-subquery-in-predicate plan shape and stays ~12%
    * selective at every SF. The mean re-enters doubles in ONE pinned
    * expression: exact-decimal Σ cast to double, divided by the exact
    * count. */
  private val q11ImportantParts: Q = sqlQ("""
    WITH pv AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
               AS val
      FROM graft_th_lineitem GROUP BY 1)
    SELECT l_partkey, CAST(val AS DOUBLE) AS val FROM pv
    WHERE CAST(val AS DOUBLE) >
          1.25 * (SELECT CAST(sum(val) AS DOUBLE) / count(*) FROM pv)
    ORDER BY val DESC, l_partkey""")

  /** TPC-H Q13 (customer distribution): LEFT JOIN keeps order-less
    * customers so the c_count = 0 bucket is real; the join-side filter
    * lives in the join condition, not WHERE (the Q13 trap). */
  private val q13CustomerDistribution: Q = sqlQ("""
    WITH co AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM graft_th_customer LEFT JOIN graft_th_orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM co GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC""")

  /** TPC-H Q16 (parts/supplier relationship), adapted: the part–supplier
    * pairs come from lineitem (no partsupp), the supplier blacklist is a
    * NOT IN subquery (s_acctbal < 1500 standing in for the comment
    * match) — non-null key, so Catalyst plans a plain anti-join. */
  private val q16PartsSupplierCount: Q = sqlQ("""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM graft_th_part JOIN graft_th_lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13' AND p_type <> 'STANDARD'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM graft_th_supplier
                            WHERE s_acctbal < 1500)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")

  /** TPC-H Q17 (small-quantity revenue): the correlated scalar AVG runs
    * against the fact table itself — decorrelation must build the
    * per-part average ONCE and join it back, not rescan lineitem per row.
    * Exact: l_quantity is integral, so avg is sum/count of exact longs. */
  private val q17SmallQuantity: Q = sqlQ("""
    SELECT CAST(floor(100 *
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             / 7.0) AS BIGINT) AS avg_yearly_x100
    FROM graft_th_lineitem JOIN graft_th_part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                        FROM graft_th_lineitem l2
                        WHERE l2.l_partkey = p_partkey)""")

  /** TPC-H Q19 (discounted revenue): three OR'd brand×size×quantity
    * conjunctions — the disjunctive-pushdown shape (a shared l_partkey =
    * p_partkey equi-join must still be extracted from under the OR). */
  private val q19DisjunctiveRevenue: Q = sqlQ("""
    SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
             AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM graft_th_lineitem JOIN graft_th_part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)""")

  /** TPC-H Q20 (excess availability), adapted: suppliers who shipped
    * more than half of some ECONOMY part's total 1996 volume — a nested
    * IN whose inner WHERE holds a correlated scalar SUM over the fact
    * table (availqty stood in by the part's own total). */
  private val q20ExcessSuppliers: Q = sqlQ("""
    SELECT s_suppkey, s_name FROM graft_th_supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM (
        SELECT l_suppkey, l_partkey AS pk, sum(l_quantity) AS q
        FROM graft_th_lineitem JOIN graft_th_part ON p_partkey = l_partkey
        WHERE p_type = 'ECONOMY'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2) sp
      WHERE q > 0.5 * (SELECT sum(l2.l_quantity) FROM graft_th_lineitem l2
                       WHERE l2.l_partkey = sp.pk
                         AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
                         AND l2.l_shipdate < TIMESTAMP '1997-01-01'))
    ORDER BY s_suppkey""")

  /** TPC-H Q21 (suppliers who kept orders waiting), adapted: the
    * returned-line flag stands in for the missing receipt>commit
    * predicate. EXISTS (another supplier in the order) + NOT EXISTS
    * (another supplier ALSO at fault) — a semi- and an anti-join on the
    * same fact-table key, the benchmark's hardest subquery shape. */
  private val q21SoleBlameSupplier: Q = sqlQ("""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM graft_th_supplier
    JOIN graft_th_lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN graft_th_orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM graft_th_lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM graft_th_lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name ORDER BY numwait DESC, s_name""")

  /** TPC-H Q22 (global sales opportunity), adapted: above-average-balance
    * customers with no URGENT order (every customer has SOME order in
    * this corpus), bucketed by nation. The average compare is exact —
    * cross-multiplied decimals (bal·N > Σbal), never an averaged
    * double. */
  private val q22NoUrgentCustomers: Q = sqlQ("""
    SELECT CAST(c_nationkey AS BIGINT) AS cntry,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             AS totacctbal
    FROM graft_th_customer c
    WHERE CAST(c_acctbal AS DECIMAL(18,6)) *
            (SELECT count(*) FROM graft_th_customer WHERE c_acctbal > 0)
          > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,6)))
             FROM graft_th_customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM graft_th_orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey ORDER BY cntry""")

  /** Winnowing fingerprints over the documents corpus. */
  private val textWinnowing: Q = (s, dir) =>
    TextAnalysis.winnowingFingerprints(documents(s, dir)).orderBy("doc_id")

  val queries: Map[String, Q] = Map(
    "q2_min_cost_supplier" -> q2MinCostSupplier,
    "q11_important_parts" -> q11ImportantParts,
    "q13_customer_distribution" -> q13CustomerDistribution,
    "q16_parts_supplier_count" -> q16PartsSupplierCount,
    "q17_small_quantity" -> q17SmallQuantity,
    "q19_disjunctive_revenue" -> q19DisjunctiveRevenue,
    "q20_excess_suppliers" -> q20ExcessSuppliers,
    "q21_sole_blame_supplier" -> q21SoleBlameSupplier,
    "q22_no_urgent_customers" -> q22NoUrgentCustomers,
    "text_winnowing" -> textWinnowing)

  /** DuckDB twin of Spark's conv(substring(md5(g), 1, 10), 16, 10): fold
    * the first 10 hex chars of `hx` into a 40-bit long. */
  private val HexFold10: String =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(range(1, 11), j -> " +
      "CAST(strpos('0123456789abcdef', substr(hx, CAST(j AS INT), 1)) - 1 " +
      "AS BIGINT))), (x,y) -> x*16 + y)"

  /** The CTE chain producing winnowing's selected (doc_id, n_grams, h,
    * sel_pos) rows over `table(doc_id, text)` — shared with the
    * dedup_winnowing oracles in [[R9dQueries]]. */
  private[queries] def winnowingSelCtes(table: String): String =
    s"""toks AS (
       |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
       |  FROM $table),
       |glist AS (
       |  SELECT doc_id, list_transform(range(1, len(t) - 3),
       |    i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
       |             t[i+3] || ' ' || t[i+4])) AS gl
       |  FROM toks WHERE len(t) >= 5),
       |grams AS (
       |  SELECT doc_id, CAST(unnest(range(1, len(gl) + 1)) AS BIGINT)
       |    AS pos, unnest(gl) AS hx
       |  FROM glist),
       |hashed AS (
       |  SELECT doc_id, pos, $HexFold10 AS h,
       |         count(*) OVER (PARTITION BY doc_id) AS n_grams
       |  FROM grams),
       |wins AS (
       |  SELECT doc_id, n_grams,
       |         min(h * 1048576 + (1048575 - pos))
       |           OVER (PARTITION BY doc_id ORDER BY pos
       |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
       |         pos
       |  FROM hashed),
       |sel AS (
       |  SELECT DISTINCT doc_id, n_grams, fp // 1048576 AS h,
       |         1048575 - (fp % 1048576) AS sel_pos
       |  FROM wins WHERE pos <= n_grams - 3)""".stripMargin

  private val WinnowingOracle: String =
    s"""WITH ${winnowingSelCtes("documents")},
       |agg AS (
       |  SELECT doc_id, max(n_grams) AS n_grams,
       |         CAST(count(*) AS BIGINT) AS n_fp,
       |         md5(list_aggregate(list_transform(list_sort(list(DISTINCT h)),
       |           x -> CAST(x AS VARCHAR)), 'string_agg', ',')) AS fp_digest
       |  FROM sel GROUP BY doc_id)
       |SELECT * FROM agg ORDER BY doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q2_min_cost_supplier" ->
      """WITH ps AS MATERIALIZED (
        |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
        |         min(l_extendedprice / l_quantity) AS cost
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT p_partkey, s_suppkey, s_name, cost
        |FROM part JOIN ps ON p_partkey = partkey
        |JOIN supplier ON s_suppkey = suppkey
        |WHERE p_type = 'STANDARD' AND p_size < 20
        |  AND cost = (SELECT min(ps2.cost) FROM ps ps2
        |              WHERE ps2.partkey = p_partkey)
        |ORDER BY p_partkey, s_suppkey""".stripMargin,

    "q11_important_parts" ->
      """WITH pv AS MATERIALIZED (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
        |      AS val
        |  FROM lineitem GROUP BY 1)
        |SELECT l_partkey, CAST(val AS DOUBLE) AS val FROM pv
        |WHERE CAST(val AS DOUBLE) >
        |      1.25 * (SELECT CAST(sum(val) AS DOUBLE) / count(*) FROM pv)
        |ORDER BY val DESC, l_partkey""".stripMargin,

    "q13_customer_distribution" ->
      """WITH co AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q16_parts_supplier_count" ->
      """SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type <> 'STANDARD'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 1500)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q17_small_quantity" ->
      """SELECT CAST(floor(100 *
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |    / 7.0) AS BIGINT) AS avg_yearly_x100
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#13'
        |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin,

    "q19_disjunctive_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q20_excess_suppliers" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM (
        |    SELECT l_suppkey, l_partkey AS pk, sum(l_quantity) AS q
        |    FROM lineitem JOIN part ON p_partkey = l_partkey
        |    WHERE p_type = 'ECONOMY'
        |      AND l_shipdate >= TIMESTAMP '1996-01-01'
        |      AND l_shipdate < TIMESTAMP '1997-01-01'
        |    GROUP BY 1, 2) sp
        |  WHERE q > 0.5 * (SELECT sum(l2.l_quantity) FROM lineitem l2
        |                   WHERE l2.l_partkey = sp.pk
        |                     AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
        |                     AND l2.l_shipdate < TIMESTAMP '1997-01-01'))
        |ORDER BY s_suppkey""".stripMargin,

    "q21_sole_blame_supplier" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin,

    "q22_no_urgent_customers" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS cntry,
        |       CAST(count(*) AS BIGINT) AS numcust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
        |         AS totacctbal
        |FROM customer c
        |WHERE CAST(c_acctbal AS DECIMAL(18,6)) *
        |        (SELECT count(*) FROM customer WHERE c_acctbal > 0)
        |      > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,6)))
        |         FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY cntry""".stripMargin,

    "text_winnowing" -> WinnowingOracle)
}
