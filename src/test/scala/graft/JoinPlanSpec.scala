package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions for the co-located and skew-join strategies —
  * the point of these keys IS the plan shape, so the tests pin it.
  */
class JoinPlanSpec extends AnyFunSuite {
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

  test("tumbling window folds to a plain agg: ONE shuffle, no Expand fan-out") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val df = SparkEntry.queries("q_tumbling_window")(spark, sf)
      val plan = df.queryExecution.executedPlan
      val expands = plan.collect {
        case e: org.apache.spark.sql.execution.ExpandExec => e }
      assert(expands.isEmpty,
        "tumbling (slide == length) must compute the bucket directly, not expand")
      // shuffles: source spread + (window,user) distinct phase + window agg
      // + final orderBy range — the agg itself is the ONE hash shuffle pair
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size <= 4, s"unexpected shuffle count:\n$plan")
    }
  }

  test("sliding window expands each event into exactly length/slide windows") {
    val n = spark.read
      .schema("event_id long, user_id long, event_type string, value double, props string")
      .parquet(s"$sf/events.parquet").count()
    val windowed = SparkEntry.queries("q_sliding_window")(spark, sf)
    val total = windowed.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(total == 2 * n, s"every event must land in exactly 2 windows ($total vs ${2 * n})")
  }

  test("bucketed join: sort-merge join with NO shuffle exchange on either side") {
    // AQE off so the static plan is inspectable directly
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val df = SparkEntry.queries("q_bucketed_join")(spark, sf)
      val smjs = df.queryExecution.executedPlan.collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, "expected a sort-merge join over the bucketed tables")
      val shufflesBelowJoin = smjs.head.collect { case e: ShuffleExchangeExec => e }
      assert(shufflesBelowJoin.isEmpty,
        s"bucketed sides must not re-shuffle:\n${smjs.head}")
      // and the result is still correct (count of all orders preserved)
      assert(df.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0) ==
        spark.read.parquet(s"$sf/orders.parquet").count())
    }
  }

  test("AQE skew join: runtime skew-split engages on the hot key") {
    // thresholds scaled down to the test corpus so the 80%-hot partition
    // qualifies; at production scale the defaults (256 MB) do this job
    withConf(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "128B",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64B",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // the downstream agg reuses the join's hash(key) partitioning, so the
      // split adds a shuffle — allow AQE to trade that for skew parallelism
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true") {
      val df = SparkEntry.queries("q_skew_join_aqe")(spark, sf)
      df.collect() // execute THIS plan so AQE finalizes it
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the join, got:\n$plan")
    }
  }

  test("salted and AQE skew joins agree row-for-row") {
    val a = SparkEntry.queries("q_skew_join_salted")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("q_skew_join_aqe")(spark, sf).collect().toSeq
    assert(a == b)
  }
}
