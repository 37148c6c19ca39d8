package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions for the round-7 operator shapes — each of
  * these keys exists partly FOR its plan, so the plan is pinned.
  */
class R7PlanSpec extends AnyFunSuite {
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

  test("q_exists_subquery rewrites to broadcast semi/anti joins — no cartesian") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val plan = SparkEntry.queries("q_exists_subquery")(spark, sf)
        .queryExecution.executedPlan
      val joins = plan.collect { case j: BroadcastHashJoinExec => j.joinType.sql }
      assert(joins.exists(_.contains("SEMI")) && joins.exists(_.contains("ANTI")),
        s"EXISTS/NOT EXISTS must become semi+anti joins, got $joins")
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
        "correlated subqueries must never plan a cartesian product")
    }
  }

  test("q_ntile_window: ONE window operator serves all three rank functions") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val plan = SparkEntry.queries("q_ntile_window")(spark, sf)
        .queryExecution.executedPlan
      val windows = plan.collect { case w: WindowExec => w }
      assert(windows.size == 1,
        s"ntile/percent_rank/cume_dist share one frame → one WindowExec, got ${windows.size}")
      assert(windows.head.windowExpression.size == 3)
    }
  }

  test("q_median_histogram: the window runs over the HISTOGRAM, not the rows") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val df = SparkEntry.queries("q_median_histogram")(spark, sf)
      val plan = df.queryExecution.executedPlan
      val windows = plan.collect { case w: WindowExec => w }
      assert(windows.nonEmpty)
      // below every window there must be an aggregation (the (flag, qty)
      // count) — i.e. the window input is the bounded histogram
      windows.foreach { w =>
        val aggsBelow = w.collect {
          case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
          case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
        }
        assert(aggsBelow.nonEmpty,
          s"median window must consume the aggregated histogram:\n$w")
      }
    }
  }

  test("corpus_normalize_text is exchange-free (pure row-local projection)") {
    val plan = SparkEntry.queries("corpus_normalize_text")(spark, sf)
      .queryExecution.executedPlan
    // the only allowed exchanges: the conditional source spread and the
    // final presentation orderBy range — no mid-pipeline hash shuffle
    val hashShuffles = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(hashShuffles.isEmpty,
      s"normalization must not hash-shuffle anything:\n$plan")
  }

  test("text_hll_distinct: register aggregation is map-side combined") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val plan = SparkEntry.queries("text_hll_distinct")(spark, sf)
        .queryExecution.executedPlan
      // every hash shuffle in the sketch side carries at most m register
      // rows per partition thanks to partial aggregation below it: assert
      // a partial agg exists under each shuffle that feeds the register agg
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      shuffles.foreach { sh =>
        val partialAggs = sh.collect {
          case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
        }
        assert(partialAggs.nonEmpty || sh.numPartitions <= 4,
          s"register shuffle without map-side combine:\n$sh")
      }
    }
  }

  test("corpus_embed_pipeline: bucket-keyed dedup join, no cartesian/BNLJ") {
    val plan = SparkEntry.queries("corpus_embed_pipeline")(spark, sf)
      .queryExecution.executedPlan
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
    assert(plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, "semantic chunk dedup must join on the bucket key, never all-pairs")
  }

  test("ann_filtered_persisted: the label predicate prunes PARTITIONS in the scan") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val df = SparkEntry.queries("ann_filtered_persisted")(spark, sf)
      val scans = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val indexScan = scans.find(_.partitionFilters.nonEmpty)
      assert(indexScan.isDefined,
        s"expected a partition-filtered index scan, got:\n${scans.mkString("\n")}")
      // and the pruned read produces the same rows as the in-memory filter
      val mem = SparkEntry.queries("ann_filtered_search")(spark, sf).collect()
      assert(df.collect().toSeq == mem.toSeq,
        "persisted partition-pruned results must equal the in-memory filter")
    }
  }

  test("ann_knn_graph: no cartesian/BNLJ — the self-join is bucket-keyed") {
    val plan = SparkEntry.queries("ann_knn_graph")(spark, sf)
      .queryExecution.executedPlan
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
    assert(plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, "knn graph must join on the bucket key, never all-pairs")
  }
}
