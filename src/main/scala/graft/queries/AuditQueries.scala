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

  val queries: Map[String, Q] = Map(
    "q_dq_checks" -> qDqChecks,
    "q_asof_forward" -> qAsofForward)

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
