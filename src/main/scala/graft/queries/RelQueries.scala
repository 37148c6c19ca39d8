package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The standard relational surface (SURVEY.md §2.2: exposed natively via
  * Catalyst — joins, aggregation, windows, sorts, set ops, grouping sets,
  * as-of). Money sums go through DECIMAL(18,6) and back to DOUBLE: per-row
  * double arithmetic is IEEE-identical across engines, the decimal cast
  * rounds identically, and decimal summation is exact — so results are
  * bit-equal regardless of partitioning/summation order (a plain double SUM
  * would drift with partition count).
  */
object RelQueries {
  import Synth._

  type Q = (SparkSession, String) => DataFrame

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,6)")).cast("double")

  // TPC-H-Q1-style aggregation: partial (map-side) agg + 2-key shuffle only.
  private val q1Agg: Q = (s, dir) =>
    lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  // 3-way join: customer is the small dimension → explicit broadcast, so the
  // only shuffle is orders⋈lineitem on orderkey (scales to any lineitem size).
  private val q3Join: Q = (s, dir) =>
    lineitem(s, dir)
      .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment")

  // TPC-H-Q5-shaped 5-way join: the region→nation dim chain broadcasts
  // (tiny), customer/supplier broadcast (small), and the one big
  // orders⋈lineitem shuffle carries the fact volume. Local-supplier
  // predicate c_nationkey = s_nationkey, revenue by nation.
  private val q5MultiJoin: Q = (s, dir) => {
    val nations = broadcast(
      s.read.parquet(s"$dir/nation.parquet")
        .join(broadcast(s.read.parquet(s"$dir/region.parquet")
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey")))
    lineitem(s, dir)
      .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s.read.parquet(s"$dir/supplier.parquet")),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(nations, col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("n_name")
  }

  // Semi/anti joins (both broadcast the aggregated key set at scale).
  private val qSemiAnti: Q = (s, dir) => {
    val c = customer(s, dir)
    val o = orders(s, dir)
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("semi").as("kind"), col("n"))
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("anti").as("kind"), col("n"))
    anti.unionAll(semi).orderBy("kind")
  }

  // Window function: latest order per customer.
  private val qWindow: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey")
      .orderBy("o_custkey")
  }

  // lead/lag window surface: per-customer order chronology with the
  // previous order key and the inter-order gap in epoch seconds — the same
  // one-hash-shuffle + in-partition-sort shape as q_window (lag adds no
  // extra exchange; both functions share one window frame).
  private val qLeadLag: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("prev_orderkey", lag(col("o_orderkey"), 1).over(w))
      .withColumn("gap_seconds",
        // NTZ → timestamp is exact under the session's pinned UTC zone
        (col("o_orderdate").cast("timestamp").cast("long") -
          lag(col("o_orderdate"), 1).over(w).cast("timestamp").cast("long")))
      .select("o_custkey", "o_orderkey", "prev_orderkey", "gap_seconds")
      .orderBy("o_custkey", "o_orderkey")
  }

  // Multi-stage conversion funnel (view → click → purchase, strictly
  // time-ordered) — the product-analytics staple, in the scale-safe
  // shape: NO per-user window/sort over the event stream; each stage is a
  // filtered min-aggregation chained by a user_id equi-join (all keys
  // high-cardinality, map-side combined), so the funnel costs three
  // filtered aggs + three joins at any event volume. Nullable stage
  // timestamps; stage = how far the user got.
  private val qFunnel: Q = (s, dir) => {
    val ev = eventsTs(s, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("t_view"))
    val s2 = ev.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(col("ts_us") > col("t_view"))
      .groupBy("user_id").agg(min("ts_us").as("t_click"))
    val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("ts_us") > col("t_click"))
      .groupBy("user_id").agg(min("ts_us").as("t_purchase"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        (lit(1L) + when(col("t_click").isNotNull, 1L).otherwise(0L)
          + when(col("t_purchase").isNotNull, 1L).otherwise(0L)).as("stage"))
      .orderBy("user_id")
  }

  // Rank-family window surface: ntile quartiles + percent_rank + cume_dist
  // of per-customer spend WITHIN each market segment — the analyst's
  // distribution-position triple. The window is PARTITIONED (by segment):
  // an unpartitioned rank window is a single-task global sort and must
  // never ship at scale — any rank query needs a partition key, and the
  // segment is this one's natural unit of comparison. Plan: one map-side-
  // combined agg shuffle for spend, one broadcast join for the segment,
  // one hash exchange + in-partition sort shared by all three functions.
  // The doubles are exact rationals (rank-1)/(n-1) etc., so both engines
  // emit identical bits.
  private val qNtileWindow: Q = (s, dir) => {
    val spend = orders(s, dir)
      .groupBy("o_custkey")
      .agg(dsum(col("o_totalprice")).as("spend"))
      .join(broadcast(customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))),
        "o_custkey")
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("spend").desc, col("o_custkey"))
    spend
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .orderBy("o_custkey")
  }

  // Correlated subquery surface (EXISTS / NOT EXISTS + a correlated scalar
  // subquery) through spark.sql — Catalyst's RewritePredicateSubquery turns
  // the predicates into the same semi/anti joins q_semi_anti declares
  // directly, and the scalar subquery becomes one aggregated left join: the
  // SQL front door to plans already proven scale-safe, not a new executor
  // shape.
  private val qExistsSubquery: Q = (s, dir) => {
    customer(s, dir).createOrReplaceTempView("graft_sub_customer")
    orders(s, dir).createOrReplaceTempView("graft_sub_orders")
    s.sql("""
      SELECT c_custkey,
             (SELECT count(*) FROM graft_sub_orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT') AS n_urgent
      FROM graft_sub_customer c
      WHERE EXISTS (SELECT 1 FROM graft_sub_orders o
                    WHERE o.o_custkey = c.c_custkey)
        AND NOT EXISTS (SELECT 1 FROM graft_sub_orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '5-LOW')
      ORDER BY c_custkey""")
  }

  // RANGE window frame — the VALUE-based frame next to the ROWS frames
  // used elsewhere: per customer, the rolling count and decimal-exact sum
  // of orders in the 30 days UP TO each order (inclusive), measured on the
  // order-date axis, not row offsets — ties and gaps behave correctly
  // where a rowsBetween frame would not. Same one-exchange shape as every
  // window here: hash-partition on the entity key, in-partition sort; the
  // frame bound adds no exchange. Dates go through epoch days (integer) so
  // the range arithmetic is engine-exact.
  private val qRangeFrame: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey").orderBy(col("d"))
      .rangeBetween(-30L, 0L)
    orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"), col("o_totalprice"))
      .withColumn("d", datediff(col("od"), lit("1970-01-01").cast("date")).cast("long"))
      .withColumn("n_30d", count(lit(1)).over(w))
      .withColumn("spend_30d",
        sum(col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double"))
      .select("o_custkey", "o_orderkey", "d", "n_30d", "spend_30d")
      .orderBy("o_custkey", "o_orderkey")
  }

  // Unpivot (melt): wide per-flag quantity columns back to long form — the
  // inverse of q_pivot, exercised on its output shape. Spark's unpivot is
  // a plan-level Expand (each row emits one output row per value column);
  // no shuffle beyond the source aggregation.
  private val qUnpivot: Q = (s, dir) =>
    lineitem(s, dir)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(dsum(col("l_quantity")))
      .na.fill(0.0, Seq("F", "O"))
      .unpivot(Array(col("l_returnflag")), Array(col("F"), col("O")),
        "status", "qty")
      .orderBy("l_returnflag", "status")

  // Full outer join over two key sets that only partly overlap (customers
  // with URGENT orders vs customers with LOW orders): both null sides
  // survive, coalesced key + per-side counts. One shuffle per side on the
  // join key (AQE may broadcast at small SF — plan adapts by size).
  private val qFullOuter: Q = (s, dir) => {
    val o = orders(s, dir)
    def side(p: String, n: String) = o.filter(col("o_orderpriority") === p)
      .groupBy(col("o_custkey").as(s"${n}_key"))
      .agg(count(lit(1)).as(s"n_$n"))
    side("1-URGENT", "hi").join(side("5-LOW", "lo"),
        col("hi_key") === col("lo_key"), "full_outer")
      .select(coalesce(col("hi_key"), col("lo_key")).as("custkey"),
        coalesce(col("n_hi"), lit(0L)).as("n_hi"),
        coalesce(col("n_lo"), lit(0L)).as("n_lo"))
      .orderBy("custkey")
  }

  // Complex-type aggregation surface: per order, the SORTED array of its
  // part keys (collect_list + sort_array — deterministic regardless of
  // arrival order) serialized to CSV for the oracle compare, plus array
  // cardinalities. One map-side-combined shuffle on the high-cardinality
  // order key; arrays stay row-local (never a shuffle key).
  private val qCollectList: Q = (s, dir) =>
    lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_partkey"))).as("parts"),
        count(lit(1)).as("n_lines"))
      .select(col("l_orderkey"),
        array_join(col("parts"), ",").as("parts_csv"),
        size(array_distinct(col("parts"))).cast("long").as("n_distinct_parts"),
        col("n_lines"))
      .orderBy("l_orderkey")

  // Exact LOWER-median per group WITHOUT a sort: the value-domain
  // histogram trick (the same shape as corpus_select_top_quality) — when
  // the measure has a bounded domain (l_quantity ∈ 1..50), the exact
  // order statistic is one (group, value) count aggregation plus a
  // cumulative scan over ≤|domain| rows per group. At 100 TB this beats
  // any percentile that buffers per-group values: the heavy agg is
  // map-side combined on a high-cardinality composite key and the window
  // runs over 50-row groups. Lower median = smallest v with cum ≥ ⌈n/2⌉.
  private val qMedianHistogram: Q = (s, dir) => {
    val hist = lineitem(s, dir)
      .select(col("l_returnflag").as("flag"), col("l_quantity").cast("long").as("qty"))
      .groupBy("flag", "qty").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("flag").orderBy("qty")
      .rowsBetween(Window.unboundedPreceding, 0)
    val n = Window.partitionBy("flag")
    hist
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(n))
      .filter(col("cum") * 2 >= col("n") + 1)
      .groupBy("flag")
      .agg(min("qty").as("median_qty"), max("n").as("n"))
      .orderBy("flag")
  }

  // Calendar/date scalar surface over the order-date axis: truncation,
  // part extraction, month arithmetic with end-of-month clamping, ISO
  // week — the functions every reporting query leans on, pinned across
  // engines (Spark's Sunday=1 dayofweek vs DuckDB's Sunday=0 is mapped in
  // the oracle). Pure narrow projection.
  private val qDateScalars: Q = (s, dir) =>
    orders(s, dir)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"))
      .select(col("o_orderkey"),
        date_format(col("d"), "yyyy-MM-dd").as("iso"),
        date_format(date_trunc("month", col("d")), "yyyy-MM-dd").as("month_start"),
        date_format(last_day(col("d")), "yyyy-MM-dd").as("month_end"),
        date_format(add_months(col("d"), 2), "yyyy-MM-dd").as("plus2m"),
        year(col("d")).cast("long").as("y"),
        quarter(col("d")).cast("long").as("q"),
        dayofyear(col("d")).cast("long").as("doy"),
        dayofweek(col("d")).cast("long").as("dow"),
        weekofyear(col("d")).cast("long").as("iso_week"))
      .orderBy("o_orderkey")

  // Data profiling — the pre-training audit every pipeline runs: one row
  // per (column, metric) with counts, nulls, distincts, min/max (numerics
  // as scaled-integer cents so the long-form table stays one type).
  // Plan: ONE pass computes all plain aggregates; the distincts ride the
  // same job as separate count(DISTINCT) columns (Expand + two-phase agg,
  // the q_distinct_agg shape); the long form is a literal-pivot projection
  // of the single result row — no per-metric scans.
  private val qDataProfile: Q = (s, dir) => {
    val o = orders(s, dir)
    val row = o.agg(
      count(lit(1)).as("n"),
      count(col("o_custkey")).as("ck_nn"),
      countDistinct(col("o_custkey")).as("ck_d"),
      min(col("o_custkey")).as("ck_min"), max(col("o_custkey")).as("ck_max"),
      count(col("o_totalprice")).as("tp_nn"),
      countDistinct(col("o_totalprice")).as("tp_d"),
      min((col("o_totalprice") * 100).cast("long")).as("tp_min"),
      max((col("o_totalprice") * 100).cast("long")).as("tp_max"),
      count(col("o_orderstatus")).as("st_nn"),
      countDistinct(col("o_orderstatus")).as("st_d"))
    def m(colName: String, metric: String, v: org.apache.spark.sql.Column) =
      row.select(lit(colName).as("column"), lit(metric).as("metric"),
        v.cast("long").as("value"))
    m("o_custkey", "non_null", col("ck_nn"))
      .unionAll(m("o_custkey", "distinct", col("ck_d")))
      .unionAll(m("o_custkey", "min", col("ck_min")))
      .unionAll(m("o_custkey", "max", col("ck_max")))
      .unionAll(m("o_orderstatus", "distinct", col("st_d")))
      .unionAll(m("o_orderstatus", "non_null", col("st_nn")))
      .unionAll(m("o_totalprice", "distinct", col("tp_d")))
      .unionAll(m("o_totalprice", "max_cents", col("tp_max")))
      .unionAll(m("o_totalprice", "min_cents", col("tp_min")))
      .unionAll(m("o_totalprice", "non_null", col("tp_nn")))
      .unionAll(m("table", "rows", col("n")))
      .orderBy("column", "metric")
  }

  // Equi-width numeric histogram over order value — the profiling
  // companion: literal bin bounds (no min/max pre-pass), one map-side-
  // combined agg onto ≤ |bins| cells.
  private val qHistogram: Q = (s, dir) =>
    orders(s, dir)
      .select(least(floor(col("o_totalprice") / 50000.0), lit(9L)).cast("long")
        .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .orderBy("bin")

  // Time-series gap fill (resampling): per-user 15-min activity buckets
  // with MISSING buckets materialized as zero rows between each user's
  // first and last event — the regularization step before any
  // window/forecast consumer. The dense axis is generated per user with
  // sequence()+explode (fan-out bounded by the user's own span — never a
  // global calendar cross join), then the observed counts left-join on
  // the (user, bucket) composite: both sides high-cardinality,
  // map-side combined.
  private val qGapFill: Q = (s, dir) => {
    val B = 900000000L // 15 min in µs
    val ev = eventsTs(s, dir)
      .select(col("user_id"), expr(s"ts_us div $B").as("bucket"))
    val counts = ev.groupBy("user_id", "bucket").agg(count(lit(1)).as("n"))
    // generate only the MISSING buckets (lead-delta gap ranges) instead of
    // exploding the full dense span and outer-joining it back: the union
    // replaces the join, and the explode fan-out shrinks from Σ span to
    // Σ gaps — the occupancy complement (r12 verdict item 5: at sf30 the
    // dense explode made this the worst absolute heavy key). Same rows:
    // span endpoints are always present buckets, so present ∪ interior
    // gaps = the dense span.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("bucket")
    val gaps = counts
      .withColumn("nxt", lead(col("bucket"), 1).over(w))
      .where(col("nxt") > col("bucket") + 1)
      .select(col("user_id"),
        explode(sequence(col("bucket") + 1, col("nxt") - 1)).as("bucket"),
        lit(0L).as("n"))
    counts.select(col("user_id"), col("bucket"), col("n"))
      .unionAll(gaps)
      .select(col("user_id"), (col("bucket") * B).as("bucket_us"), col("n"))
      .orderBy("user_id", "bucket_us")
  }

  // Null-semantics surface: null-safe equality (<=>), coalesce/nullif,
  // count(*) vs count(col), and null ordering in aggregates over a
  // projection that PLANTS nulls (every 7th status) — SQL's sharpest
  // cross-engine edges, pinned. Narrow + one small agg.
  private val qNullSemantics: Q = (s, dir) => {
    val o = orders(s, dir)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderstatus")).as("st"))
    o.groupBy(coalesce(col("st"), lit("NULL")).as("status"))
      .agg(count(lit(1)).as("n_rows"), count(col("st")).as("n_nonnull"),
        sum(when(col("st") <=> lit(null).cast("string"), 1L).otherwise(0L))
          .as("n_nullsafe_eq_null"),
        sum(when(nullif(col("st"), lit("O")).isNull && col("st").isNotNull, 1L)
          .otherwise(0L)).as("n_was_o"))
      .orderBy("status")
  }

  // Incremental aggregate maintenance — the epoch-over-epoch discipline as
  // a batch key: a standing per-customer aggregate state (count, decimal
  // sum, min, max over the first epoch) MERGED with the new epoch's
  // partial state, algebraically: merged = f(state, state) not
  // f(raw ∪ raw). The oracle recomputes from the union — proving the merge
  // is lossless — while the plan only ever aggregates each epoch once and
  // joins the two SMALL state tables. At 100 TB this is the difference
  // between reprocessing the corpus per epoch and touching only the new
  // data.
  private val qIncrementalAgg: Q = (s, dir) => {
    val o = orders(s, dir)
    def partial(df: DataFrame) = df.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("s"),
        min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
    val epoch1 = partial(o.filter(col("o_orderkey") % 3 =!= 0))
    val epoch2 = partial(o.filter(col("o_orderkey") % 3 === 0))
    epoch1.select(col("o_custkey"), col("n").as("n1"), col("s").as("s1"),
        col("mn").as("mn1"), col("mx").as("mx1"))
      .join(epoch2.select(col("o_custkey"), col("n").as("n2"), col("s").as("s2"),
        col("mn").as("mn2"), col("mx").as("mx2")), Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("n1"), lit(0L)) + coalesce(col("n2"), lit(0L))).as("n"),
        coalesce(col("s1"), lit(0).cast("decimal(18,6)"))
          .plus(coalesce(col("s2"), lit(0).cast("decimal(18,6)")))
          .cast("double").as("spend"),
        least(coalesce(col("mn1"), col("mn2")), coalesce(col("mn2"), col("mn1")))
          .as("mn"),
        greatest(coalesce(col("mx1"), col("mx2")), coalesce(col("mx2"), col("mx1")))
          .as("mx"))
      .orderBy("o_custkey")
  }

  // Global top-k: TakeOrderedAndProject (no full sort materialization).
  private val qTopk: Q = (s, dir) =>
    orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .select("o_orderkey", "o_totalprice")

  // Set operations over customer-key sets of two order-priority classes.
  private val qSetops: Q = (s, dir) => {
    val o = orders(s, dir)
    def keys(p: String) = o.filter(col("o_orderpriority") === p)
      .select(col("o_custkey")).distinct()
    val hi = keys("1-URGENT")
    val lo = keys("5-LOW")
    def cnt(df: DataFrame, kind: String) =
      df.agg(count(lit(1)).as("n")).select(lit(kind).as("kind"), col("n"))
    cnt(hi.exceptAll(lo).distinct(), "except")
      .unionAll(cnt(hi.intersect(lo), "intersect"))
      .unionAll(cnt(hi.union(lo).distinct(), "union"))
      .orderBy("kind")
  }

  // Grouping sets / rollup.
  private val qRollup: Q = (s, dir) =>
    lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"), col("sum_qty"))
      .orderBy("flag", "status")

  // As-of join (operator the reference lacks; SURVEY.md §2.2): for each
  // purchase event, the latest strictly-earlier click of the same user.
  // Implemented as the scalable single-pass union+window form — no join
  // explosion, no per-key range scan; skew-safe because each user's stream
  // is one partition of a window, not a join side.
  private val qAsofJoin: Q = (s, dir) => {
    // µs time via the shared audited conversion (Synth.eventsTs); event_id
    // tie-breaks equal-µs orderings identically in both engines.
    val ev = eventsTs(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_us"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("prev_click",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "prev_click")
      .orderBy("event_id")
  }

  // Distinct aggregation (expand + two-phase agg under the hood).
  private val qDistinctAgg: Q = (s, dir) =>
    lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  // Outer joins with null-side aggregation: per customer (kept even with no
  // orders) count + decimal-exact spend.
  private val qOuterJoin: Q = (s, dir) => {
    val c = customer(s, dir)
    val o = orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("spend"))
      .orderBy("c_custkey")
  }

  // Cube: all grouping-set combinations over two lineitem dimensions.
  private val qCube: Q = (s, dir) =>
    lineitem(s, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"))
      .orderBy("flag", "status")

  // Explicit GROUPING SETS — a mixed set list no cube/rollup expresses
  // ((flag, status) plus status-only): same single Expand + one agg
  // shuffle as cube, but fan-out bounded to exactly the named sets.
  private val qGroupingSets: Q = (s, dir) =>
    lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"))
      .orderBy("flag", "status")

  // Range join via time binning — the scalable form of an inequality join
  // (reference lacks range joins, SURVEY.md §2.2): for each purchase, count
  // the same user's clicks in the preceding hour. Naive form is an
  // inequality theta-join (quadratic per user); binning buckets time into
  // hour cells, joins on the EQUI key (user, bucket) over the probe's two
  // candidate cells, then applies the exact range predicate — shuffle on a
  // bounded equi-key, linear in input.
  private val qRangeJoinBinned: Q = (s, dir) => {
    val BucketUs = 3600L * 1000000L
    val ev = eventsTs(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("c_ts"),
        expr(s"ts_us div $BucketUs").as("bucket"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us").as("p_ts"),
        explode(array(
          expr(s"ts_us div $BucketUs"),
          expr(s"(ts_us - $BucketUs) div $BucketUs"))).as("bucket"))
    purchases.join(clicks, Seq("user_id", "bucket"), "left_outer")
      .withColumn("hit",
        when(col("c_ts").isNotNull &&
          col("c_ts") >= col("p_ts") - BucketUs && col("c_ts") <= col("p_ts"), 1L)
          .otherwise(0L))
      .groupBy("event_id")
      .agg(sum("hit").as("clicks_in_hour"))
      .orderBy("event_id")
  }

  // Sessionization (stateful op the reference lacks, SURVEY.md §2.2): 30-min
  // inactivity gap per user. Batch form = lag/gap-flag/running-sum windows —
  // one user-partitioned shuffle; the streaming twin is
  // graft.streaming.Sessionize (flatMapGroupsWithState).
  private val qSessionize: Q = (s, dir) => {
    val gapUs = 30L * 60 * 1000000L
    val ev = eventsTs(s, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val flagged = ev.withColumn("new_s",
      when(lag("ts_us", 1).over(w).isNull ||
        col("ts_us") - lag("ts_us", 1).over(w) > gapUs, 1L).otherwise(0L))
    flagged
      .withColumn("session_id",
        sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"), max("ts_us").as("end_us"))
      .orderBy("user_id", "session_id")
  }

  // Pivot: groupBy + pivot over the (small, enumerated) linestatus domain
  // compiles to ONE agg over conditional sums — no extra shuffle vs the
  // plain groupBy, no per-pivot-value pass.
  private val qPivot: Q = (s, dir) =>
    lineitem(s, dir)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(dsum(col("l_quantity")))
      .select(col("l_returnflag"), col("F").as("qty_f"), col("O").as("qty_o"))
      .orderBy("l_returnflag")

  // Event-time windowed aggregation (SURVEY.md §2.2 gap: the reference is
  // processing-time only). Tumbling 15-min windows via the native window()
  // function — Catalyst folds it to one bucket expression, so the plan is a
  // plain 1-key agg shuffle with map-side partials; epoch-aligned in UTC so
  // the DuckDB twin is integer µs bucketing.
  private val qTumblingWindow: Q = (s, dir) =>
    eventsTs(s, dir)
      .select(col("ts_us"), col("user_id"), col("value"))
      .groupBy(window(timestamp_micros(col("ts_us")), "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("users"),
        dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("w.start")).as("w_start_us"),
        col("n"), col("users"), col("sum_value"))
      .orderBy("w_start_us")

  // Sliding 30-min windows every 15 min: window() expands each event into
  // exactly length/slide = 2 rows before the agg — the fan-out is the
  // operator's semantics (an event is IN two windows), not a plan artifact.
  private val qSlidingWindow: Q = (s, dir) =>
    eventsTs(s, dir)
      .select(col("ts_us"), col("user_id"))
      .groupBy(window(timestamp_micros(col("ts_us")), "30 minutes", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("users"))
      .select(unix_micros(col("w.start")).as("w_start_us"), col("n"), col("users"))
      .orderBy("w_start_us")

  // Skew-salted shuffle join: 80% of fact rows share one hot key; the salt
  // column spreads the hot key across 16 sub-partitions and the small side
  // is replicated per salt (explode) — the classic skew mitigation when AQE
  // skew-splitting isn't available (e.g. bucketed/merge joins). The merge
  // hint forces the shuffle path so the salting is actually exercised;
  // results are identical to the unsalted join (the oracle does it plain).
  private val qSkewJoinSalted: Q = (s, dir) => {
    val S = 16L
    val ev = events(s, dir)
    val fact = ev.select(
      when(col("event_id") % 10 < 8, lit(0L)).otherwise(col("user_id")).as("key"),
      (col("event_id") % 1000).as("val"),
      (col("event_id") % S).as("salt"))
    val dim = ev.select(col("user_id").as("key")).distinct()
      .select(col("key"), concat(lit("u"), col("key").cast("string")).as("label"))
    val dimSalted = dim.withColumn("salt", explode(sequence(lit(0L), lit(S - 1))))
    fact.join(dimSalted.hint("merge"), Seq("key", "salt"))
      .groupBy("key", "label")
      .agg(count(lit(1)).as("n"), sum("val").as("sum_val"))
      .orderBy("key")
  }

  // Bucketed co-located join: both sides written ONCE bucketed (+sorted) on
  // the join key — the scan's output partitioning then satisfies the join's
  // clustering requirement, so the sort-merge join runs with NO shuffle
  // exchange on either side (plan-asserted in JoinPlanSpec). This is the
  // write-once-join-many layout for 100 TB fact tables: the shuffle is paid
  // once at ingest, not per query. The merge hint keeps the small side from
  // broadcasting so the co-location is actually exercised; the key measures
  // the honest write+join cost.
  private val qBucketedJoin: Q = (s, dir) => {
    // idempotent rebuild: the in-memory catalog forgets tables across
    // sessions but their warehouse directories persist — clear both
    def reset(table: String): Unit = {
      s.sql(s"DROP TABLE IF EXISTS $table")
      val wh = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), table)
      wh.getFileSystem(s.sparkContext.hadoopConfiguration).delete(wh, true)
    }
    reset("graft_bucketed_orders")
    reset("graft_bucketed_customer")
    orders(s, dir).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("graft_bucketed_orders")
    customer(s, dir).write
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("graft_bucketed_customer")
    s.table("graft_bucketed_customer").hint("merge")
      .join(s.table("graft_bucketed_orders"),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy("c_mktsegment")
  }

  // The same 80%-hot-key join as q_skew_join_salted, UNSALTED — the modern
  // mitigation: AQE's runtime skew-split (OptimizeSkewedJoin) carves the hot
  // shuffle partition into parallel splits, replicating the matching dim
  // rows per split exactly like the manual salt does, but decided from
  // runtime statistics instead of hand-tuning. The merge hint forces the
  // shuffle path (a broadcast would sidestep skew entirely). The dim is the
  // customer PK table (covers every user_id incl. the hot key, unique keys)
  // — a plain scan under the join, because OptimizeSkewedJoin only matches
  // join sides whose sort sits DIRECTLY on the shuffle (an aggregation-
  // derived dim like distinct() breaks the pattern). Results equal the
  // salted key's row-for-row; JoinPlanSpec asserts the split engages under
  // thresholds scaled to the test corpus.
  private val qSkewJoinAqe: Q = (s, dir) => {
    val ev = events(s, dir)
    val fact = ev.select(
      when(col("event_id") % 10 < 8, lit(0L)).otherwise(col("user_id")).as("key"),
      (col("event_id") % 1000).as("val"))
    val dim = customer(s, dir).select(col("c_custkey").as("key"),
      concat(lit("u"), col("c_custkey").cast("string")).as("label"))
    fact.join(dim.hint("merge"), Seq("key"))
      .groupBy("key", "label")
      .agg(count(lit(1)).as("n"), sum("val").as("sum_val"))
      .orderBy("key")
  }

  // Exact interpolated percentiles (percentile_cont semantics) per group.
  // Spark's `percentile` is the exact sort-based aggregate — a per-group
  // sort of that group's values only (map-side partials carry the value
  // multiset), never a global sort. Quantities are integer-valued doubles
  // and the fractions are dyadic (.25/.5/.75), so lower + (upper-lower)·f
  // is exactly representable and bit-equal across engines.
  private val qPercentileCont: Q = (s, dir) =>
    lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  // SCD2 (slowly-changing-dimension type 2) build from a change stream:
  // each event becomes a version row [valid_from, valid_to) closed by the
  // user's NEXT event via lead(); the open row is flagged current. ONE
  // hash shuffle on the entity key + in-partition sort — the standard
  // warehouse compaction shape, linear at any history depth.
  private val qScd2: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    eventsTs(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_us"))
      .withColumn("valid_to", lead("ts_us", 1).over(w))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "valid_from", "event_id")
  }

  // Total-order global sort over the fact table by a high-entropy derived
  // key — Spark samples the key distribution and range-partitions
  // (Exchange rangepartitioning), so every partition sorts independently
  // and the output is globally ordered with NO single-task funnel; the
  // canonical "deterministically shuffle the corpus" operation a training
  // pipeline runs before sharding.
  private val qGlobalSort: Q = (s, dir) =>
    lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        md5(concat(col("l_orderkey").cast("string"), lit("|"),
          col("l_linenumber").cast("string"))).as("sk"))
      .orderBy("sk")

  // Z-score anomaly detection: per-type moments from ONE map-side-combined
  // aggregate (decimal-exact sums → partition-order-free), broadcast back
  // over the stream, outliers flagged in a narrow pass. Mean/variance/z
  // use a fixed IEEE expression shape (division and sqrt are correctly
  // rounded) so both engines produce identical bits.
  private val qAnomalyZscore: Q = (s, dir) => {
    val ev = events(s, dir)
    val stats = ev.groupBy("event_type").agg(
      dsum(col("value")).as("sv"),
      dsum(col("value") * col("value")).as("sv2"),
      count(lit(1)).as("n"))
    ev.join(broadcast(stats), Seq("event_type"))
      .withColumn("z",
        (col("value") - col("sv") / col("n")) /
          sqrt(col("sv2") / col("n") - (col("sv") / col("n")) * (col("sv") / col("n"))))
      .filter(abs(col("z")) > lit(2.0))
      .select(col("event_id"), col("event_type"), col("value"), col("z"))
      .orderBy("event_id")
  }

  // Lateral/table-function surface: UNNEST WITH ORDINALITY — one row per
  // array element with its position. posexplode is a Generate node fused
  // into the scan stage: a pure narrow fan-out, no shuffle at any corpus
  // size.
  private val qLateralExplode: Q = (s, dir) =>
    documents(s, dir).filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"),
        posexplode(split(col("text"), "\\s+")).as(Seq("ord", "tok")))
      .select(col("doc_id"), col("ord").cast("long").as("ord"), col("tok"))
      .orderBy("doc_id", "ord")

  // CDC snapshot compaction: latest record per key as ONE max_by
  // aggregate — map-side combine collapses each partition to ≤|keys| rows
  // before the shuffle. The window/row_number idiom (q_window) shuffles
  // every version; this is the shape that wins when history depth ≫ key
  // count, which is what a 100-TB changelog looks like.
  private val qLatestByKey: Q = (s, dir) =>
    eventsTs(s, dir)
      .groupBy("user_id")
      .agg(max_by(
        struct(col("ts_us"), col("event_id"), col("event_type"), col("value")),
        struct(col("ts_us"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.event_id").as("event_id"),
        col("m.event_type").as("event_type"), col("m.ts_us").as("ts_us"),
        col("m.value").as("value"))
      .orderBy("user_id")

  // first/last/nth_value with IGNORE NULLS over an explicit running frame
  // — the gap-carrying "last known value" surface (sensor forward-fill,
  // sparse dimension propagation). Values are nulled on a deterministic
  // rule; all three functions share ONE frame → one WindowExec.
  private val qFirstLastWindow: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    eventsTs(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        when(col("event_type") =!= "view", col("value")).as("v"))
      .withColumn("first_v", first("v", ignoreNulls = true).over(w))
      .withColumn("last_v", last("v", ignoreNulls = true).over(w))
      .withColumn("second_v", nth_value(col("v"), 2, ignoreNulls = true).over(w))
      .select("user_id", "event_id", "first_v", "last_v", "second_v")
      .orderBy("user_id", "event_id")
  }

  // MERGE/upsert in its scale shape: both sides compact to latest-per-key
  // FIRST (map-side-combined max_by — history never reaches the join),
  // then ONE key-partitioned full outer join emits the merged snapshot
  // with its disposition (inserted / updated / kept). The set-based batch
  // form of MERGE INTO.
  private val qUpsertMerge: Q = (s, dir) => {
    val ev = eventsTs(s, dir)
    def latest(df: DataFrame) = df
      .groupBy("user_id")
      .agg(max_by(struct(col("ts_us"), col("event_id"), col("value")),
        struct(col("ts_us"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.ts_us").as("ts_us"),
        col("m.event_id").as("event_id"), col("m.value").as("value"))
    // users ≡ 0 (mod 7) are absent from the snapshot; the change feed
    // carries users ≡ 1 (mod 3) — so ≡1 (mod 3) ∧ ≡0 (mod 7) users are
    // 'inserted', ≡1 (mod 3) ∧ ≢0 (mod 7) are 'updated', the rest 'kept'
    val snap = latest(ev.filter(col("user_id") % 7 =!= 0))
      .withColumnRenamed("ts_us", "s_ts").withColumnRenamed("event_id", "s_id")
      .withColumnRenamed("value", "s_value")
    val changes = latest(ev.filter(col("user_id") % 3 === 1))
      .withColumnRenamed("ts_us", "c_ts").withColumnRenamed("event_id", "c_id")
      .withColumnRenamed("value", "c_value")
    snap.join(changes, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("c_id"), col("s_id")).as("event_id"),
        coalesce(col("c_ts"), col("s_ts")).as("ts_us"),
        coalesce(col("c_value"), col("s_value")).as("value"),
        when(col("s_id").isNull, "inserted")
          .when(col("c_id").isNull, "kept")
          .otherwise("updated").as("action"))
      .orderBy("user_id")
  }

  // Recursive CTE (Spark 4's iterative-plan surface): ancestor walk up a
  // synthetic binary hierarchy (parent = key DIV 2) — the org-chart /
  // BOM-explosion query shape, expressed declaratively instead of a
  // driver-side RDD loop. Each iteration is one distributed step; depth
  // is bounded by the hierarchy height (log₂ of the key domain here).
  private val qRecursiveCte: Q = (s, dir) => {
    events(s, dir).select(col("user_id").as("u")).distinct()
      .createOrReplaceTempView("graft_users")
    s.sql(
      """WITH RECURSIVE anc(u, a, depth) AS (
        |  SELECT u, u, 0 FROM graft_users
        |  UNION ALL
        |  SELECT u, a DIV 2, depth + 1 FROM anc WHERE a > 0)
        |SELECT u AS user_id, a AS ancestor, depth
        |FROM anc ORDER BY user_id, depth""".stripMargin)
  }

  // NATIVE session windows (session_window) — the event-time session
  // operator Structured Streaming shares with batch, next to the manual
  // lag+cumsum twin (sessionize_events). Boundary rule (probed in batch
  // AND streaming, pinned in NativeSessionStreamSpec): an event at
  // EXACTLY gap distance still merges — a new session starts only when
  // the gap strictly exceeds the timeout, the same rule as the manual
  // twin. One hash shuffle on user_id; the session merge is in-partition.
  private val qSessionWindow: Q = (s, dir) => {
    val gapUs = 1800000000L // 30 min
    eventsTs(s, dir)
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("ts_us")).as("ts"))
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        // Spark's session end = last event + gap; subtract the gap to get
        // the last-event time the manual twin reports
        (unix_micros(col("session_window.end")) - gapUs).as("end_us"),
        col("n_events"))
      .orderBy("user_id", "start_us")
  }

  // As-of join with TOLERANCE — the financial-data staple (merge_asof
  // tolerance semantics): the latest prior click counts only within a
  // 10-minute horizon; staler matches return null. Same single-pass
  // union+window shape as q_asof_join (no join explosion); the match
  // carries (ts, id) in one struct so both fields come from the SAME
  // matched row.
  private val qAsofTolerance: Q = (s, dir) => {
    val tolUs = 600000000L // 10 min
    val ev = eventsTs(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_us"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("pc",
        last(when(col("event_type") === "click",
          struct(col("ts_us").as("cts"), col("event_id").as("cid"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        when(col("pc").isNotNull && col("ts_us") - col("pc.cts") <= tolUs,
          col("pc.cid")).as("prev_click_10m"))
      .orderBy("event_id")
  }

  // Dynamic partition pruning: the fact table lands PARTITIONED BY its
  // category once; a filtered dimension join then scans ONLY the
  // partitions the dim rows select — decided at runtime via the
  // broadcast-side subquery, not statically. At 100 TB this is the
  // difference between scanning 2 partitions and 100; the layout
  // (partition column = the join/filter key) is the design decision this
  // key exhibits. R7bPlanSpec asserts the DynamicPruningExpression
  // reaches the fact scan.
  private val qDynamicPartitionPruning: Q = (s, dir) => {
    val factSlot = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      "graft-dpp", s"fact-${Integer.toHexString(dir.hashCode)}").toString
    val dimSlot = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      "graft-dpp", s"dim-${Integer.toHexString(dir.hashCode)}").toString
    eventsTs(s, dir).write.mode("overwrite")
      .partitionBy("event_type").parquet(factSlot)
    eventsTs(s, dir).select(col("event_type")).distinct()
      .withColumn("kind",
        when(col("event_type").isin("purchase", "signup"), "conversion")
          .otherwise("engagement"))
      .write.mode("overwrite").parquet(dimSlot)
    val fact = s.read.parquet(factSlot)
    // a string-equality dim predicate — the selective-filter shape the
    // PartitionPruning rule requires on the build side
    val dim = s.read.parquet(dimSlot).filter(col("kind") === "conversion")
    fact.join(broadcast(dim), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  // The NATURAL banded range join — written as the user would (pure range
  // predicate, no hand-binning): the injected RangeBinJoin optimizer rule
  // rewrites it to the binned equi-join q_range_join_binned builds by
  // hand, so this key is the end-to-end proof the rule carries real
  // queries (RangeBinJoinSpec pins the plan shape; here the oracle pins
  // the values). Cross-user on purpose: with no equi key, the unrewritten
  // plan would be a nested-loop — the shape that dies at scale.
  private val qRangeJoinAuto: Q = (s, dir) => {
    val ev = eventsTs(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts_us").as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts_us").as("p_ts"))
    clicks.join(purchases,
        col("p_ts") > col("c_ts") && col("p_ts") <= col("c_ts") + 3600000000L)
      .groupBy("click_id")
      .agg(count(lit(1)).as("n_purchases"), min("p_id").as("first_purchase"))
      .orderBy("click_id")
  }

  val queries: Map[String, Q] = Map(
    "q_range_join_auto" -> qRangeJoinAuto,
    "q_dynamic_partition_pruning" -> qDynamicPartitionPruning,
    "q_asof_tolerance" -> qAsofTolerance,
    "q_session_window" -> qSessionWindow,
    "q_recursive_cte" -> qRecursiveCte,
    "q_first_last_window" -> qFirstLastWindow,
    "q_upsert_merge" -> qUpsertMerge,
    "q_lateral_explode" -> qLateralExplode,
    "q_latest_by_key" -> qLatestByKey,
    "q_percentile_cont" -> qPercentileCont,
    "q_scd2_build" -> qScd2,
    "q_global_sort" -> qGlobalSort,
    "q_anomaly_zscore" -> qAnomalyZscore,
    "q_bucketed_join" -> qBucketedJoin,
    "q_skew_join_aqe" -> qSkewJoinAqe,
    "q_distinct_agg" -> qDistinctAgg,
    "q_outer_join" -> qOuterJoin,
    "q_cube" -> qCube,
    "q_grouping_sets" -> qGroupingSets,
    "q_range_join_binned" -> qRangeJoinBinned,
    "q_skew_join_salted" -> qSkewJoinSalted,
    "sessionize_events" -> qSessionize,
    "q_tumbling_window" -> qTumblingWindow,
    "q_sliding_window" -> qSlidingWindow,
    "q_pivot" -> qPivot,
    "q1_agg" -> q1Agg,
    "q3_join_broadcast" -> q3Join,
    "q5_multi_join" -> q5MultiJoin,
    "q_semi_anti" -> qSemiAnti,
    "q_window" -> qWindow,
    "q_range_frame" -> qRangeFrame,
    "q_collect_list" -> qCollectList,
    "q_date_scalars" -> qDateScalars,
    "q_data_profile" -> qDataProfile,
    "q_histogram" -> qHistogram,
    "q_gap_fill" -> qGapFill,
    "q_null_semantics" -> qNullSemantics,
    "q_incremental_agg" -> qIncrementalAgg,
    "q_median_histogram" -> qMedianHistogram,
    "q_unpivot" -> qUnpivot,
    "q_full_outer" -> qFullOuter,
    "q_ntile_window" -> qNtileWindow,
    "q_exists_subquery" -> qExistsSubquery,
    "q_lead_lag" -> qLeadLag,
    "q_funnel" -> qFunnel,
    "q_topk" -> qTopk,
    "q_setops" -> qSetops,
    "q_rollup" -> qRollup,
    "q_asof_join" -> qAsofJoin)

  private val DSum = "CAST(sum(CAST(%s AS DECIMAL(18,6))) AS DOUBLE)"

  /** Shared by the salted and AQE skew-join keys — the result is
    * plan-invariant, only the skew mitigation differs. */
  private val SkewJoinSql: String =
    """WITH fact AS (
      |  SELECT CASE WHEN event_id % 10 < 8 THEN 0 ELSE user_id END AS key,
      |         event_id % 1000 AS val
      |  FROM events),
      |dim AS (
      |  SELECT DISTINCT user_id AS key, 'u' || CAST(user_id AS VARCHAR) AS label
      |  FROM events)
      |SELECT f.key, d.label, count(*) AS n, CAST(sum(f.val) AS BIGINT) AS sum_val
      |FROM fact f JOIN dim d ON f.key = d.key
      |GROUP BY 1, 2 ORDER BY f.key""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_range_join_auto" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, epoch_us(ts) AS c_ts FROM events
        |  WHERE event_type = 'click'),
        |p AS (
        |  SELECT event_id AS p_id, epoch_us(ts) AS p_ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT click_id, count(*) AS n_purchases, min(p_id) AS first_purchase
        |FROM c JOIN p ON p_ts > c_ts AND p_ts <= c_ts + 3600000000
        |GROUP BY click_id ORDER BY click_id""".stripMargin,

    "q_dynamic_partition_pruning" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events WHERE event_type IN ('purchase', 'signup')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_asof_tolerance" ->
      """SELECT event_id,
        |  CASE WHEN cts IS NOT NULL AND ts_us - cts <= 600000000
        |       THEN cid END AS prev_click_10m
        |FROM (
        |  SELECT event_id, event_type, epoch_us(ts) AS ts_us,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END
        |      IGNORE NULLS) OVER w AS cid,
        |    last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END
        |      IGNORE NULLS) OVER w AS cts
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    // manual sessionization under session_window's boundary rule
    // (a new session only when the gap STRICTLY exceeds the timeout —
    // exact-gap events merge; probed in both batch and streaming)
    "q_session_window" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |g AS (
        |  SELECT user_id, ts_us,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM f)
        |SELECT user_id, min(ts_us) AS start_us, max(ts_us) AS end_us,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin,

    "q_recursive_cte" ->
      """WITH RECURSIVE u0 AS (SELECT DISTINCT user_id AS u FROM events),
        |anc(u, a, depth) AS (
        |  SELECT u, u, 0 FROM u0
        |  UNION ALL
        |  SELECT u, a // 2, depth + 1 FROM anc WHERE a > 0)
        |SELECT u AS user_id, a AS ancestor, depth
        |FROM anc ORDER BY user_id, depth""".stripMargin,

    "q_first_last_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN event_type <> 'view' THEN value END AS v
        |  FROM events)
        |SELECT user_id, event_id,
        |  first_value(v IGNORE NULLS) OVER w AS first_v,
        |  last_value(v IGNORE NULLS) OVER w AS last_v,
        |  nth_value(v, 2 IGNORE NULLS) OVER w AS second_v
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_upsert_merge" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
        |snap AS (
        |  SELECT user_id, ts_us AS s_ts, event_id AS s_id, value AS s_value
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts_us DESC, event_id DESC) AS rn
        |        FROM e WHERE user_id % 7 <> 0) WHERE rn = 1),
        |chg AS (
        |  SELECT user_id, ts_us AS c_ts, event_id AS c_id, value AS c_value
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts_us DESC, event_id DESC) AS rn
        |        FROM e WHERE user_id % 3 = 1) WHERE rn = 1)
        |SELECT coalesce(snap.user_id, chg.user_id) AS user_id,
        |  coalesce(c_id, s_id) AS event_id,
        |  coalesce(c_ts, s_ts) AS ts_us,
        |  coalesce(c_value, s_value) AS value,
        |  CASE WHEN s_id IS NULL THEN 'inserted'
        |       WHEN c_id IS NULL THEN 'kept'
        |       ELSE 'updated' END AS action
        |FROM snap FULL OUTER JOIN chg ON snap.user_id = chg.user_id
        |ORDER BY 1""".stripMargin,

    "q_lateral_explode" ->
      """SELECT doc_id,
        |  CAST(unnest(range(0, len(l))) AS BIGINT) AS ord,
        |  unnest(l) AS tok
        |FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS l
        |      FROM documents WHERE doc_id % 50 = 0)
        |ORDER BY doc_id, ord""".stripMargin,

    "q_latest_by_key" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us, value
        |  FROM events)
        |SELECT user_id, event_id, event_type, ts_us, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts_us DESC, event_id DESC) AS rn FROM e)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_percentile_cont" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_scd2_build" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events)
        |SELECT user_id, event_id, event_type, ts_us AS valid_from,
        |  lead(ts_us) OVER w AS valid_to,
        |  lead(ts_us) OVER w IS NULL AS is_current
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, valid_from, event_id""".stripMargin,

    "q_global_sort" ->
      """SELECT l_orderkey, l_linenumber,
        |  md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)) AS sk
        |FROM lineitem ORDER BY sk""".stripMargin,

    "q_anomaly_zscore" ->
      s"""WITH st AS (
         |  SELECT event_type,
         |    ${DSum.format("value")} AS sv,
         |    ${DSum.format("value * value")} AS sv2,
         |    count(*) AS n
         |  FROM events GROUP BY 1)
         |SELECT event_id, e.event_type, value,
         |  (value - sv / n) / sqrt(sv2 / n - (sv / n) * (sv / n)) AS z
         |FROM events e JOIN st ON e.event_type = st.event_type
         |WHERE abs((value - sv / n) / sqrt(sv2 / n - (sv / n) * (sv / n))) > 2.0
         |ORDER BY event_id""".stripMargin,

    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${DSum.format("l_quantity")} AS sum_qty,
         |  ${DSum.format("l_extendedprice")} AS sum_base,
         |  ${DSum.format("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${DSum.format("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_join_broadcast" ->
      s"""SELECT c_mktsegment,
         |  ${DSum.format("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  count(*) AS n
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q5_multi_join" ->
      s"""SELECT n_name,
         |  ${DSum.format("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  count(*) AS n
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_semi_anti" ->
      """SELECT 'anti' AS kind, count(*) AS n FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'semi', count(*) FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY kind""".stripMargin,

    "q_window" ->
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q_range_frame" ->
      """SELECT o_custkey, o_orderkey, d,
        |  CAST(count(*) OVER w AS BIGINT) AS n_30d,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS spend_30d
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        CAST(date_diff('day', DATE '1970-01-01',
        |          CAST(o_orderdate AS DATE)) AS BIGINT) AS d
        |      FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY d
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_data_profile" ->
      """WITH a AS (
        |  SELECT count(*) AS n,
        |    count(o_custkey) AS ck_nn, count(DISTINCT o_custkey) AS ck_d,
        |    min(o_custkey) AS ck_min, max(o_custkey) AS ck_max,
        |    count(o_totalprice) AS tp_nn, count(DISTINCT o_totalprice) AS tp_d,
        |    min(CAST(o_totalprice * 100 AS BIGINT)) AS tp_min,
        |    max(CAST(o_totalprice * 100 AS BIGINT)) AS tp_max,
        |    count(o_orderstatus) AS st_nn,
        |    count(DISTINCT o_orderstatus) AS st_d
        |  FROM orders)
        |SELECT "column", metric, CAST(value AS BIGINT) AS value FROM (
        |  SELECT 'o_custkey' AS "column", 'non_null' AS metric, ck_nn AS value FROM a
        |  UNION ALL SELECT 'o_custkey', 'distinct', ck_d FROM a
        |  UNION ALL SELECT 'o_custkey', 'min', ck_min FROM a
        |  UNION ALL SELECT 'o_custkey', 'max', ck_max FROM a
        |  UNION ALL SELECT 'o_orderstatus', 'distinct', st_d FROM a
        |  UNION ALL SELECT 'o_orderstatus', 'non_null', st_nn FROM a
        |  UNION ALL SELECT 'o_totalprice', 'distinct', tp_d FROM a
        |  UNION ALL SELECT 'o_totalprice', 'max_cents', tp_max FROM a
        |  UNION ALL SELECT 'o_totalprice', 'min_cents', tp_min FROM a
        |  UNION ALL SELECT 'o_totalprice', 'non_null', tp_nn FROM a
        |  UNION ALL SELECT 'table', 'rows', n FROM a)
        |ORDER BY "column", metric""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 50000.0), 9) AS BIGINT) AS bin,
        |  count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin,

    "q_null_semantics" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS st
        |  FROM orders)
        |SELECT coalesce(st, 'NULL') AS status,
        |  count(*) AS n_rows,
        |  count(st) AS n_nonnull,
        |  CAST(sum(CASE WHEN st IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_nullsafe_eq_null,
        |  CAST(sum(CASE WHEN nullif(st, 'O') IS NULL AND st IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_was_o
        |FROM o GROUP BY 1 ORDER BY status""".stripMargin,

    // the oracle recomputes from the UNION of epochs — the merge must be
    // lossless against full recomputation
    "q_incremental_agg" ->
      """SELECT o_custkey, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS spend,
        |  min(o_totalprice) AS mn, max(o_totalprice) AS mx
        |FROM orders GROUP BY 1 ORDER BY o_custkey""".stripMargin,

    "q_gap_fill" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 900000000 AS bucket FROM events),
        |counts AS (
        |  SELECT user_id, bucket, count(*) AS n FROM e GROUP BY 1, 2),
        |spans AS (
        |  SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
        |  FROM e GROUP BY 1),
        |dense AS (
        |  SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket FROM spans)
        |SELECT d.user_id, d.bucket * 900000000 AS bucket_us,
        |  CAST(coalesce(n, 0) AS BIGINT) AS n
        |FROM dense d LEFT JOIN counts c
        |  ON d.user_id = c.user_id AND d.bucket = c.bucket
        |ORDER BY d.user_id, bucket_us""".stripMargin,

    "q_date_scalars" ->
      """SELECT o_orderkey,
        |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS iso,
        |  strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d')
        |    AS month_start,
        |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        |  strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE),
        |    '%Y-%m-%d') AS plus2m,
        |  CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS y,
        |  CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS q,
        |  CAST(dayofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS doy,
        |  CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS dow,
        |  CAST(weekofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_week
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_collect_list" ->
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(l_partkey)), ',') AS parts_csv,
        |  CAST(len(list_distinct(list(l_partkey))) AS BIGINT) AS n_distinct_parts,
        |  count(*) AS n_lines
        |FROM lineitem GROUP BY 1 ORDER BY l_orderkey""".stripMargin,

    "q_median_histogram" ->
      """WITH hist AS (
        |  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty,
        |    count(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (
        |  SELECT flag, qty, c,
        |    sum(c) OVER (PARTITION BY flag ORDER BY qty
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY flag) AS n
        |  FROM hist)
        |SELECT flag, CAST(min(qty) AS BIGINT) AS median_qty,
        |  CAST(max(n) AS BIGINT) AS n
        |FROM cum WHERE cum * 2 >= n + 1
        |GROUP BY 1 ORDER BY flag""".stripMargin,

    "q_unpivot" ->
      """WITH p AS (
        |  SELECT l_returnflag,
        |    coalesce(CAST(sum(CASE WHEN l_linestatus = 'F'
        |      THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE), 0.0) AS qf,
        |    coalesce(CAST(sum(CASE WHEN l_linestatus = 'O'
        |      THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE), 0.0) AS qo
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, status, qty FROM (
        |  SELECT l_returnflag, 'F' AS status, qf AS qty FROM p
        |  UNION ALL
        |  SELECT l_returnflag, 'O', qo FROM p)
        |ORDER BY l_returnflag, status""".stripMargin,

    "q_full_outer" ->
      """WITH hi AS (SELECT o_custkey AS hi_key, CAST(count(*) AS BIGINT) AS n_hi
        |            FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
        |     lo AS (SELECT o_custkey AS lo_key, CAST(count(*) AS BIGINT) AS n_lo
        |            FROM orders WHERE o_orderpriority = '5-LOW' GROUP BY 1)
        |SELECT coalesce(hi_key, lo_key) AS custkey,
        |  coalesce(n_hi, 0) AS n_hi, coalesce(n_lo, 0) AS n_lo
        |FROM hi FULL OUTER JOIN lo ON hi_key = lo_key
        |ORDER BY custkey""".stripMargin,

    "q_ntile_window" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS spend,
        |    c_mktsegment
        |  FROM orders JOIN customer ON c_custkey = o_custkey
        |  GROUP BY o_custkey, c_mktsegment)
        |SELECT o_custkey, spend, c_mktsegment,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM spend
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY spend DESC, o_custkey)
        |ORDER BY o_custkey""".stripMargin,

    "q_exists_subquery" ->
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey
        |     AND o.o_orderpriority = '1-URGENT') AS n_urgent
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '5-LOW')
        |ORDER BY c_custkey""".stripMargin,

    "q_lead_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey) OVER w AS prev_orderkey,
        |  CAST(date_diff('second', lag(o_orderdate) OVER w, o_orderdate)
        |       AS BIGINT) AS gap_seconds
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s1 AS (SELECT user_id, min(ts_us) AS t_view FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(ts_us) AS t_click FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND ts_us > t_view GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(ts_us) AS t_purchase FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND ts_us > t_click GROUP BY 1)
        |SELECT s1.user_id, t_view, t_click, t_purchase,
        |  CAST(1 + CAST(t_click IS NOT NULL AS INT)
        |         + CAST(t_purchase IS NOT NULL AS INT) AS BIGINT) AS stage
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_setops" ->
      """WITH hi AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |     lo AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
        |SELECT 'except' AS kind, count(*) AS n FROM (SELECT * FROM hi EXCEPT SELECT * FROM lo)
        |UNION ALL
        |SELECT 'intersect', count(*) FROM (SELECT * FROM hi INTERSECT SELECT * FROM lo)
        |UNION ALL
        |SELECT 'union', count(*) FROM (SELECT * FROM hi UNION SELECT * FROM lo)
        |ORDER BY kind""".stripMargin,

    "q_rollup" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS flag,
         |  coalesce(l_linestatus, 'ALL') AS status,
         |  count(*) AS n, ${DSum.format("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY flag, status""".stripMargin,

    "q_asof_join" ->
      """SELECT event_id, prev_click FROM (
        |  SELECT event_id, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click
        |  FROM events WHERE event_type IN ('click', 'purchase'))
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 0.0) AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status, count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,

    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus))
        |ORDER BY flag, status""".stripMargin,

    "q_range_join_binned" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events)
        |SELECT p.event_id, CAST(count(c.ts_us) AS BIGINT) AS clicks_in_hour
        |FROM (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT user_id, ts_us FROM e WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        |  AND c.ts_us >= p.ts_us - 3600000000 AND c.ts_us <= p.ts_us
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS qty_f,
        |  CAST(sum(CASE WHEN l_linestatus = 'O'
        |    THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS qty_o
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_tumbling_window" ->
      """SELECT (epoch_us(ts) // 900000000) * 900000000 AS w_start_us,
        |  count(*) AS n, count(DISTINCT user_id) AS users,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // each event lands in exactly two 30-min/15-min-slide windows: starts
    // floor15(t) and floor15(t) - 15 min
    "q_sliding_window" ->
      """WITH w AS (
        |  SELECT ((epoch_us(ts) // 900000000) - j) * 900000000 AS w_start_us, user_id
        |  FROM events, range(0, 2) r(j))
        |SELECT w_start_us, count(*) AS n, count(DISTINCT user_id) AS users
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_skew_join_salted" -> SkewJoinSql,
    // same result (customer's PK covers every fact key exactly once), skew
    // handled by AQE at runtime instead of manual salting
    "q_skew_join_aqe" -> SkewJoinSql.replace(
      "SELECT DISTINCT user_id AS key, 'u' || CAST(user_id AS VARCHAR) AS label\n  FROM events",
      "SELECT c_custkey AS key, 'u' || CAST(c_custkey AS VARCHAR) AS label\n  FROM customer"),

    "q_bucketed_join" ->
      s"""SELECT c_mktsegment, count(*) AS n, ${DSum.format("o_totalprice")} AS total
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "sessionize_events" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |g AS (
        |  SELECT user_id, ts_us,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM g GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin)
}
