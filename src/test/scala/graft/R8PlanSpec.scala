package graft

import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan + semantics pins for the round-8 wave. */
class R8PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q_max_concurrency: every window is day-partitioned — no global running sum") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val plan = SparkEntry.queries("q_max_concurrency")(spark, sf)
        .queryExecution.executedPlan
      val windows = plan.collect { case w: WindowExec => w }
      assert(windows.nonEmpty, s"expected a window for the running sum:\n$plan")
      windows.foreach { w =>
        assert(w.partitionSpec.nonEmpty,
          s"unpartitioned window = one serial task over the corpus:\n$w")
      }
    }
  }

  test("q_max_concurrency: banded carry-in equals the global sweep (planted)") {
    // Intervals planted to straddle a midnight: the banded result must
    // equal the naive single-order global cumsum evaluated per point.
    import spark.implicits._
    val day = 86400000000L
    val dur = 1800000000L
    val starts = Seq(
      day - 3 * dur / 2, // spans midnight (carry into day 1)
      day - dur / 2,     // spans midnight
      day - dur / 2 + 1, // spans midnight
      day + 10L,         // inside day 1
      day + 20L,         // inside day 1
      2 * day - dur,     // end lands exactly on the day-2 boundary
      5L, 6L, 7L)        // day 0 cluster
    val ev = starts.toDF("ts_us")
    // banded: reimplementation of the query's shape over the planted frame
    val bounds = ev.select(col("ts_us").as("t"), lit(1L).as("d"))
      .unionAll(ev.select((col("ts_us") + dur).as("t"), lit(-1L).as("d")))
    val net = bounds.groupBy(expr(s"t div ${day}L").as("day"), col("t"))
      .agg(sum("d").as("net"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("day").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = net.withColumn("run", sum("net").over(w))
    val carry = ev
      .filter(expr(s"ts_us div ${day}L") =!= expr(s"(ts_us + ${dur}L) div ${day}L"))
      .groupBy(expr(s"(ts_us + ${dur}L) div ${day}L").as("day"))
      .agg(count(lit(1)).as("carry_in"))
    val banded = run.groupBy("day").agg(max("run").as("max_run"))
      .join(carry, Seq("day"), "left")
      .select(col("day"),
        (coalesce(col("carry_in"), lit(0L)) + col("max_run")).as("mc"))
      .orderBy("day").as[(Long, Long)].collect().toMap
    // global truth: one unpartitioned cumsum (fine on 9 planted rows)
    val globalW = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val global = net.withColumn("conc", sum("net").over(globalW))
      .groupBy(expr(s"t div ${day}L").as("day")).agg(max("conc").as("mc"))
      .orderBy("day").as[(Long, Long)].collect().toMap
    assert(banded == global, s"banded=$banded global=$global")
    assert(banded(1L) >= 3L, "midnight-straddling intervals must carry into day 1")
  }

  test("text_bigram_topk cuts with TakeOrdered — no global sort of the gram table") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val plan = SparkEntry.queries("text_bigram_topk")(spark, sf)
        .queryExecution.executedPlan
      assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
        s"top-50 cut must be TakeOrdered, not sort+limit:\n$plan")
    }
  }

  test("q_regression_stats: one partially-combined aggregation, no window") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val plan = SparkEntry.queries("q_regression_stats")(spark, sf)
        .queryExecution.executedPlan
      assert(plan.collect { case w: WindowExec => w }.isEmpty,
        s"moment sums must be aggregates, not windows:\n$plan")
      assert(plan.collect { case a: HashAggregateExec => a }.size >= 2,
        s"expected partial+final hash aggregation:\n$plan")
    }
  }

  test("graph_bfs_layers: seeds at dist 0, frontier distances exact on a path") {
    import spark.implicits._
    // path graph 0-1-2-3-4-5-6: seed 0 only (0 % 10 == 0)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val out = graft.queries.GraphQueries.bfsLayers(edges)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L),
      s"4-round BFS from seed 0 over a path must stop at hop 4: $out")
  }

  test("graph_resource_alloc: exact fixed-point scores on a known wedge") {
    import spark.implicits._
    // star: 1-2, 1-3 (common neighbor 1 with deg 2) plus 2-3 direct
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val out = graft.queries.GraphQueries.resourceAlloc(edges)
      .select("a", "c", "ra_score_e12").as[(Long, Long, Long)].collect().toSet
    // every node has undirected degree 2 → each pair shares exactly one
    // common neighbor of degree 2 → score = 1e12 div 2
    assert(out == Set((1L, 2L, 500000000000L), (1L, 3L, 500000000000L),
      (2L, 3L, 500000000000L)), s"got $out")
  }

  test("emb_matryoshka_recall: full-dim recall is perfect and recall is monotone-ish") {
    val rows = SparkEntry.queries("emb_matryoshka_recall")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(64L) == 50L, s"64-dim truncation IS the baseline: $rows")
    assert(rows(8L) <= rows(64L), s"prefix truncation cannot beat full dims: $rows")
  }
}
