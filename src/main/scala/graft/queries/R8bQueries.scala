package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 second wave: time-series self-correlation, interval coverage
  * (the union-length sweep, banded per entity), and degree-mixing
  * assortativity — each an integer-moments exhibit of the repo's
  * float-determinism rule (exact BIGINT sums through every shuffle, ONE
  * pinned IEEE expression at the end shared verbatim with the oracle).
  */
object R8bQueries {
  import Synth._

  type Q = (SparkSession, String) => DataFrame

  private val SessUs = 1800000000L // 30-min interval per event
  private val DayUs = 86400000000L

  // ------------------------------------------------------- autocorrelation

  /** Lag-k autocorrelation (k = 1, 7) of the daily event-count series —
    * the periodicity probe behind ingest-seasonality detection. The series
    * itself is one map-side-combined agg onto the |days| axis (bounded);
    * each lag is an equi-join of the series against itself shifted
    * (day-keyed, |days| rows — trivially broadcastable), and the Pearson r
    * over (c_t, c_{t+k}) pairs runs through exact BIGINT moment sums
    * (daily counts < 2²⁰, days < 2⁷ → every product < 2⁵³, so the final
    * pinned expression's operands are exactly-representable doubles). */
  private val qAutocorr: Q = (s, dir) => {
    val daily = eventsTs(s, dir)
      .groupBy(expr(s"ts_us div ${DayUs}L").as("day"))
      .agg(count(lit(1)).as("c"))
    def lagCorr(lag: Int): DataFrame =
      daily
        .join(
          daily.select((col("day") - lag).as("day"), col("c").as("c2")),
          "day")
        .agg(count(lit(1)).as("n_pairs"),
          sum("c").as("sx"), sum("c2").as("sy"),
          sum(col("c") * col("c")).as("sxx"),
          sum(col("c2") * col("c2")).as("syy"),
          sum(col("c") * col("c2")).as("sxy"))
        .select(lit(lag.toLong).as("lag"), col("n_pairs"),
          (col("n_pairs") * col("sxy") - col("sx") * col("sy")).as("num"),
          (col("n_pairs") * col("sxx") - col("sx") * col("sx")).as("denx"),
          (col("n_pairs") * col("syy") - col("sy") * col("sy")).as("deny"))
        .select(col("lag"), col("n_pairs"),
          when(col("denx") === 0 || col("deny") === 0, lit(0.0))
            .otherwise(col("num").cast("double") /
              (sqrt(col("denx").cast("double")) *
                sqrt(col("deny").cast("double"))))
            .as("acf"))
    lagCorr(1).unionAll(lagCorr(7)).orderBy("lag")
  }

  // ------------------------------------------------------ interval union

  /** Per-user total covered time under 30-min activity intervals — the
    * interval-UNION length (overlaps counted once), the billing/uptime twin
    * of q_max_concurrency's sweep. No global sort: the running
    * max-end window is PARTITIONED BY USER (each user's history is one
    * independent task), and the increment
    * `greatest(0, e − greatest(s, max_prev_end))` telescopes to exactly the
    * measure of ∪[s,e) per user. Events share a fixed interval length, so
    * order ties (equal s ⇒ equal e) contribute 0 either way — the window
    * order is total for every row that matters. All-integer µs arithmetic;
    * the only output transform is a truncating div to minutes. */
  private val qIntervalUnion: Q = (s, dir) => {
    val iv = eventsTs(s, dir)
      .select(col("user_id"), col("ts_us").as("st"),
        (col("ts_us") + SessUs).as("en"))
    val w = Window.partitionBy("user_id").orderBy("st", "en")
      .rowsBetween(Window.unboundedPreceding, -1)
    iv.withColumn("pmax", max("en").over(w))
      .withColumn("inc",
        greatest(lit(0L),
          col("en") - greatest(col("st"), coalesce(col("pmax"), col("st")))))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"), sum("inc").as("covered_us"))
      .withColumn("covered_min", expr("covered_us div 60000000L"))
      .orderBy("user_id")
  }

  // ------------------------------------------------------- assortativity

  /** Degree-mixing (assortativity) coefficient: Pearson r of
    * (deg(src), deg(dst)) over the directed edge set — positive means hubs
    * link hubs (social graphs), negative means hubs link leaves (web/biology).
    * Degree table = one node-keyed agg; the two endpoint joins are
    * node-keyed against a |V|-row table (AQE broadcasts at bench scale,
    * SMJ at 100 TB — both correct); moments are exact BIGINTs (deg ≤ |V|
    * < 2¹⁶, |E| < 2³² → products < 2⁵³). One row out. */
  private val qAssortativity: Q = (s, dir) => {
    val ed = GraphQueries.edges(s, dir)
    val deg = GraphQueries.degrees(ed).select(col("node"), col("total_deg"))
    ed.join(deg.withColumnRenamed("node", "src")
          .withColumnRenamed("total_deg", "dx"), "src")
      .join(deg.withColumnRenamed("node", "dst")
          .withColumnRenamed("total_deg", "dy"), "dst")
      .agg(count(lit(1)).as("n_edges"),
        sum("dx").as("sx"), sum("dy").as("sy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"),
        sum(col("dx") * col("dy")).as("sxy"))
      .select(col("n_edges"),
        (col("n_edges") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n_edges") * col("sxx") - col("sx") * col("sx")).as("denx"),
        (col("n_edges") * col("syy") - col("sy") * col("sy")).as("deny"))
      .select(col("n_edges"),
        when(col("denx") === 0 || col("deny") === 0, lit(0.0))
          .otherwise(col("num").cast("double") /
            (sqrt(col("denx").cast("double")) *
              sqrt(col("deny").cast("double"))))
          .as("assortativity"))
  }

  // ---------------------------------------------------------- wiring

  val queries: Map[String, Q] = Map(
    "q_autocorr" -> qAutocorr,
    "q_interval_union" -> qIntervalUnion,
    "graph_assortativity" -> qAssortativity)

  // ---------------------------------------------------------- oracles

  private val EdgesSql =
    """SELECT DISTINCT user_id AS src, event_id % 150 AS dst FROM events
      |  WHERE event_type IN ('click','view') AND event_id % 10 < 3
      |    AND user_id <> event_id % 150""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_autocorr" ->
      s"""WITH daily AS (
         |  SELECT epoch_us(ts) // $DayUs AS day, count(*) AS c
         |  FROM events GROUP BY 1),
         |pairs AS (
         |  SELECT a.c AS x, b.c AS y, a.day AS day, CAST(1 AS BIGINT) AS lag
         |  FROM daily a JOIN daily b ON b.day - 1 = a.day
         |  UNION ALL
         |  SELECT a.c, b.c, a.day, CAST(7 AS BIGINT)
         |  FROM daily a JOIN daily b ON b.day - 7 = a.day),
         |m AS (
         |  SELECT lag, count(*) AS n_pairs,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy
         |  FROM pairs GROUP BY lag),
         |d AS (
         |  SELECT lag, n_pairs,
         |    n_pairs * sxy - sx * sy AS num,
         |    n_pairs * sxx - sx * sx AS denx,
         |    n_pairs * syy - sy * sy AS deny
         |  FROM m)
         |SELECT lag, n_pairs,
         |  CASE WHEN denx = 0 OR deny = 0 THEN 0.0
         |       ELSE CAST(num AS DOUBLE)
         |            / (sqrt(CAST(denx AS DOUBLE)) * sqrt(CAST(deny AS DOUBLE)))
         |  END AS acf
         |FROM d ORDER BY lag""".stripMargin,

    "q_interval_union" ->
      s"""WITH iv AS (
         |  SELECT user_id, epoch_us(ts) AS st, epoch_us(ts) + $SessUs AS en
         |  FROM events),
         |r AS (
         |  SELECT user_id, st, en,
         |    max(en) OVER (PARTITION BY user_id ORDER BY st, en
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
         |  FROM iv)
         |SELECT user_id, count(*) AS n_intervals,
         |  CAST(sum(greatest(0, en - greatest(st, coalesce(pmax, st)))) AS BIGINT)
         |    AS covered_us,
         |  CAST(sum(greatest(0, en - greatest(st, coalesce(pmax, st)))) AS BIGINT)
         |    // 60000000 AS covered_min
         |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,

    "graph_assortativity" ->
      s"""WITH edges AS ($EdgesSql),
         |deg AS (
         |  SELECT node, CAST(sum(o) + sum(i) AS BIGINT) AS total_deg FROM (
         |    SELECT src AS node, 1 AS o, 0 AS i FROM edges
         |    UNION ALL
         |    SELECT dst, 0, 1 FROM edges)
         |  GROUP BY node),
         |p AS (
         |  SELECT a.total_deg AS dx, b.total_deg AS dy
         |  FROM edges e
         |  JOIN deg a ON e.src = a.node
         |  JOIN deg b ON e.dst = b.node),
         |m AS (
         |  SELECT count(*) AS n_edges,
         |    CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
         |    CAST(sum(dx * dx) AS BIGINT) AS sxx,
         |    CAST(sum(dy * dy) AS BIGINT) AS syy,
         |    CAST(sum(dx * dy) AS BIGINT) AS sxy
         |  FROM p),
         |d AS (
         |  SELECT n_edges,
         |    n_edges * sxy - sx * sy AS num,
         |    n_edges * sxx - sx * sx AS denx,
         |    n_edges * syy - sy * sy AS deny
         |  FROM m)
         |SELECT n_edges,
         |  CASE WHEN denx = 0 OR deny = 0 THEN 0.0
         |       ELSE CAST(num AS DOUBLE)
         |            / (sqrt(CAST(denx AS DOUBLE)) * sqrt(CAST(deny AS DOUBLE)))
         |  END AS assortativity
         |FROM d""".stripMargin)
}
