package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality constraint audit + forward as-of — the ingest-side
  * validation surface (SURVEY.md §2.3). A pipeline that lands 100 TB a day
  * runs a Deequ/dbt-test-shaped expectation suite over every batch; the
  * expensive mistake is running one job per rule. Here ALL single-table
  * rules evaluate in ONE aggregation pass (each rule is a conditional
  * count — map-side combined, one shuffle to a single row), and the one
  * cross-table rule (referential integrity) is the proven broadcast
  * anti-join shape. Output is long-form (rule, violations, pass) — the
  * audit log a scheduler gates on.
  */
object AuditQueries {
  import Synth._

  type Q = (SparkSession, String) => DataFrame

  /** Expectation suite over events: uniqueness, completeness, range,
    * set-membership, and cross-table referential integrity — each as a
    * violation count, all single-table rules in ONE agg. */
  private val qDqChecks: Q = (s, dir) => {
    val ev = eventsTs(s, dir)
    val single = ev.agg(
      // uniqueness: total − distinct = duplicate surplus
      (count(lit(1)) - countDistinct(col("event_id"))).as("pk_unique"),
      count(when(col("props").isNull, 1)).as("props_complete"),
      count(when(col("value") < 0 || col("value").isNaN, 1)).as("value_range"),
      count(when(!col("event_type").isin(
        "view", "click", "purchase", "signup", "error"), 1)).as("type_in_set"),
      count(when(col("ts_us") < lit(1262304000000000L), 1)).as("ts_sane"))
    // referential integrity: every lineitem's order must exist — the
    // anti-join probes a broadcast build of the key side
    val orphans = lineitem(s, dir)
      .join(broadcast(orders(s, dir).select(col("o_orderkey"))),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("fk_orders"))
    val long = single.crossJoin(orphans)
      .selectExpr("stack(6, " +
        "'event_id_unique', pk_unique, " +
        "'props_complete', props_complete, " +
        "'value_in_range', value_range, " +
        "'event_type_in_set', type_in_set, " +
        "'ts_after_2010', ts_sane, " +
        "'lineitem_order_exists', fk_orders) AS (rule, violations)")
    long.select(col("rule"), col("violations"),
        (col("violations") === 0).as("pass"))
      .orderBy("rule")
  }

  /** Forward as-of: for every click, the NEXT purchase of the same user
    * (the attribution direction opposite q_asof_join) — same single-pass
    * union+window shape, frame reversed. */
  private val qAsofForward: Q = (s, dir) => {
    val ev = eventsTs(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_us"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    ev.withColumn("next_purchase",
        first(when(col("event_type") === "purchase", col("event_id")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .select("event_id", "next_purchase")
      .orderBy("event_id")
  }

  /** FILTER-clause aggregation surface: several conditional aggregates of
    * one pass over the stream — the idiomatic replacement for N separate
    * filtered jobs (and for CASE-WHEN-NULL contortions). */
  private val qFilteredAgg: Q = (s, dir) =>
    eventsTs(s, dir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_total"),
        count_if(col("event_type") === "purchase").as("n_purchases"),
        count_if(col("event_type") === "error").as("n_errors"),
        sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0d)).cast("decimal(18,6)")).cast("double")
          .as("purchase_value"),
        max(when(col("event_type") === "click", col("ts_us"))).as("last_click_us"))
      .orderBy("user_id")

  /** Correlated scalar subquery through the SQL front door — Catalyst
    * de-correlates it into an aggregate + join, no per-row re-execution
    * (the rewrite that makes 100-TB correlated SQL possible at all). */
  private val qScalarSubquery: Q = (s, dir) => {
    eventsTs(s, dir).createOrReplaceTempView("ev_ssq")
    s.sql(
      """SELECT event_id, user_id, value,
        |  (SELECT max(e2.value) FROM ev_ssq e2
        |   WHERE e2.user_id = e1.user_id) AS user_max,
        |  value = (SELECT max(e3.value) FROM ev_ssq e3
        |           WHERE e3.user_id = e1.user_id) AS is_user_max
        |FROM ev_ssq e1
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin)
  }

  /** unionByName with allowMissingColumns — the DataFrame-level sibling of
    * src_schema_evolution: two frames with overlapping-but-different
    * schemas align by NAME (position-based union would silently mismatch)
    * and absent columns null-fill. */
  private val qUnionByName: Q = (s, dir) => {
    val ev = eventsTs(s, dir)
    val old = ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("user_id"), col("value"))
    val neu = ev.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("event_type"), col("user_id"), col("value"))
    old.unionByName(neu, allowMissingColumns = true)
      .groupBy(coalesce(col("event_type"), lit("__old__")).as("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  /** MapType aggregation surface: per-user event_type→count maps built
    * with map_from_entries over a SORTED entry array, rendered through
    * to_json so the oracle (which assembles the same JSON text with an
    * ordered string_agg) compares exactly — the deterministic way to ship
    * complex types through a text compare. */
  private val qMapAgg: Q = (s, dir) =>
    eventsTs(s, dir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(
        to_json(map_from_entries(array_sort(
          collect_list(struct(col("event_type"), col("n")))))).as("type_counts"),
        sum("n").as("total"))
      .orderBy("user_id")

  /** Higher-order array function surface — transform / filter / exists /
    * aggregate / zip_with lambdas over the token array, all row-local and
    * codegen'd (the APIs that keep array logic OUT of explode+shuffle):
    * one narrow projection, integer outputs. */
  private val qArrayFunctions: Q = (s, dir) =>
    documents(s, dir)
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        expr("size(filter(toks, t -> length(t) > 4))").cast("long").as("n_long"),
        expr("exists(toks, t -> t = 'the')").as("has_the"),
        expr("aggregate(transform(toks, t -> length(t)), 0L, (a, x) -> a + x)")
          .as("total_chars"),
        expr("aggregate(zip_with(toks, reverse(toks), (a, b) -> " +
          "CASE WHEN a = b THEN 1L ELSE 0L END), 0L, (a, x) -> a + x)")
          .as("palindromic_positions"))
      .orderBy("doc_id")

  /** Contribution analysis: each user's share of their event type's total
    * value, in EXACT ppm — decimal micro-units (6dp ×10⁶ → BIGINT is a
    * lossless rescale in both engines) then integer division, so no float
    * ratio can drift. The type totals come from a second small agg joined
    * back (broadcast at any realistic type cardinality), not a window over
    * the raw stream. */
  private val qPercentOfTotal: Q = (s, dir) => {
    val micro = (c: org.apache.spark.sql.Column) =>
      (sum(c.cast("decimal(18,6)")) * 1000000).cast("long")
    val perUser = eventsTs(s, dir)
      .groupBy("event_type", "user_id")
      .agg(micro(col("value")).as("user_micro"))
    val perType = perUser.groupBy("event_type")
      .agg(sum("user_micro").as("type_micro"))
    perUser.join(broadcast(perType), "event_type")
      .select(col("event_type"), col("user_id"),
        expr("1000000 * user_micro div type_micro").as("share_ppm"))
      .orderBy("event_type", "user_id")
  }

  /** ANSI error-safe scalar surface — try_divide / try_cast / try_add turn
    * would-be runtime errors (÷0, bad casts, long overflow) into NULLs a
    * pipeline can quarantine instead of dying 40 TB into a job. Planted
    * zero divisors, unparseable strings, and a guaranteed overflow; the
    * oracle mirrors each with explicit CASE guards. */
  private val qTryArithmetic: Q = (s, dir) =>
    eventsTs(s, dir)
      .select(col("event_id"),
        expr("try_divide(event_id, event_id % 7)").as("safe_div"),
        expr("try_cast(CASE WHEN event_id % 3 = 0 THEN 'not-a-number' " +
          "ELSE CAST(event_id AS STRING) END AS BIGINT)").as("parsed"),
        expr("try_add(9223372036854775807L, event_id)").as("ovf"))
      .orderBy("event_id")

  val queries: Map[String, Q] = Map(
    "q_try_arithmetic" -> qTryArithmetic,
    "q_percent_of_total" -> qPercentOfTotal,
    "q_map_agg" -> qMapAgg,
    "q_array_functions" -> qArrayFunctions,
    "q_dq_checks" -> qDqChecks,
    "q_asof_forward" -> qAsofForward,
    "q_filtered_agg" -> qFilteredAgg,
    "q_scalar_subquery" -> qScalarSubquery,
    "q_union_by_name" -> qUnionByName)

  val oracle: Map[String, String] = Map(
    "q_dq_checks" ->
      """WITH single AS (
        |  SELECT count(*) - count(DISTINCT event_id) AS pk_unique,
        |    count(CASE WHEN props IS NULL THEN 1 END) AS props_complete,
        |    count(CASE WHEN value < 0 OR isnan(value) THEN 1 END) AS value_range,
        |    count(CASE WHEN event_type NOT IN
        |      ('view','click','purchase','signup','error') THEN 1 END) AS type_in_set,
        |    count(CASE WHEN epoch_us(ts) < 1262304000000000 THEN 1 END) AS ts_sane
        |  FROM events),
        |fk AS (
        |  SELECT count(*) AS fk_orders FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                    WHERE o.o_orderkey = l.l_orderkey)),
        |long AS (
        |  SELECT 'event_id_unique' AS rule, pk_unique AS violations FROM single
        |  UNION ALL SELECT 'props_complete', props_complete FROM single
        |  UNION ALL SELECT 'value_in_range', value_range FROM single
        |  UNION ALL SELECT 'event_type_in_set', type_in_set FROM single
        |  UNION ALL SELECT 'ts_after_2010', ts_sane FROM single
        |  UNION ALL SELECT 'lineitem_order_exists', fk_orders FROM fk)
        |SELECT rule, CAST(violations AS BIGINT) AS violations,
        |  violations = 0 AS pass
        |FROM long ORDER BY rule""".stripMargin,

    "q_try_arithmetic" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 7 = 0 THEN NULL
        |       ELSE CAST(event_id AS DOUBLE) / (event_id % 7) END AS safe_div,
        |  TRY_CAST(CASE WHEN event_id % 3 = 0 THEN 'not-a-number'
        |                ELSE CAST(event_id AS VARCHAR) END AS BIGINT) AS parsed,
        |  CASE WHEN event_id > 0 THEN NULL
        |       ELSE 9223372036854775807 END AS ovf
        |FROM events ORDER BY event_id""".stripMargin,

    "q_percent_of_total" ->
      """WITH pu AS (
        |  SELECT event_type, user_id,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
        |      AS user_micro
        |  FROM events GROUP BY 1, 2),
        |pt AS (
        |  SELECT event_type, CAST(sum(user_micro) AS BIGINT) AS type_micro
        |  FROM pu GROUP BY 1)
        |SELECT pu.event_type, pu.user_id,
        |  1000000 * user_micro // type_micro AS share_ppm
        |FROM pu JOIN pt USING (event_type)
        |ORDER BY pu.event_type, pu.user_id""".stripMargin,

    "q_array_functions" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(toks, x -> length(x) > 4)) AS BIGINT) AS n_long,
        |  len(list_filter(toks, x -> x = 'the')) > 0 AS has_the,
        |  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
        |    AS total_chars,
        |  CAST(list_sum(list_transform(range(1, len(toks) + 1),
        |    i -> CASE WHEN toks[CAST(i AS INT)] =
        |                   toks[CAST(len(toks) - i + 1 AS INT)]
        |              THEN 1 ELSE 0 END)) AS BIGINT) AS palindromic_positions
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_map_agg" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id,
        |  '{' || string_agg('"' || event_type || '":' || n, ',' ORDER BY event_type)
        |      || '}' AS type_counts,
        |  CAST(sum(n) AS BIGINT) AS total
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_filtered_agg" ->
      """SELECT user_id, count(*) AS n_total,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
        |  count(*) FILTER (WHERE event_type = 'error') AS n_errors,
        |  CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value
        |                     ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
        |    AS purchase_value,
        |  max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
        |    AS last_click_us
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT event_id, user_id, value,
        |  (SELECT max(e2.value) FROM events e2
        |   WHERE e2.user_id = e1.user_id) AS user_max,
        |  value = (SELECT max(e3.value) FROM events e3
        |           WHERE e3.user_id = e1.user_id) AS is_user_max
        |FROM events e1
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    "q_union_by_name" ->
      """SELECT CASE WHEN event_id % 2 = 0 THEN '__old__'
        |            ELSE event_type END AS event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_asof_forward" ->
      """SELECT event_id, next_purchase FROM (
        |  SELECT event_id, event_type,
        |    first_value(CASE WHEN event_type = 'purchase' THEN event_id END
        |      IGNORE NULLS) OVER w AS next_purchase
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |WHERE event_type = 'click' ORDER BY event_id""".stripMargin)
}
