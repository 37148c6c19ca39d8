package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-8 second wave. */
class R8bPlanSpec extends AnyFunSuite {
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

  private def plan(key: String) =
    SparkEntry.queries(key)(spark, sf).queryExecution.executedPlan

  test("q_interval_union / q_weighted_median: every window is partitioned") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      Seq("q_interval_union", "q_weighted_median").foreach { k =>
        val p = plan(k)
        val ws = p.collect { case w: WindowExec => w }
        assert(ws.nonEmpty, s"$k: expected a window:\n$p")
        ws.foreach(w => assert(w.partitionSpec.nonEmpty,
          s"$k: unpartitioned window = one serial task over the corpus:\n$w"))
      }
    }
  }

  test("q_weighted_median: running sum + total share ONE exchange") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      // both frames are f-partitioned, so Catalyst must stack the two
      // WindowExecs without a second exchange between them
      val p = plan("q_weighted_median")
      val ws = p.collect { case w: WindowExec => w }
      assert(ws.size == 2, s"expected stacked windows:\n$p")
      val upper = ws.find(
        _.child.collect { case w2: WindowExec => w2 }.nonEmpty)
      assert(upper.isDefined, s"one window must sit above the other:\n$p")
      def reachesLowerWithoutExchange(
          node: org.apache.spark.sql.execution.SparkPlan): Boolean = node match {
        case _: WindowExec => true
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => false
        case other => other.children.exists(reachesLowerWithoutExchange)
      }
      assert(reachesLowerWithoutExchange(upper.get.child),
        s"a second exchange between the stacked windows re-shuffles the " +
          s"aggregated table for nothing:\n$p")
    }
  }

  test("sketch_kmv_distinct: bounded topk_pairs aggregate, no windows") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      // pin the pipeline BEFORE its localCheckpoint (the Q key's executed
      // plan is just the checkpointed-RDD scan)
      graft.functions.GraftFunctions.ensureRegistered(spark)
      val p = graft.queries.R8bQueries
        .kmvResult(graft.queries.R8bQueries.kmvHashed(spark, sf))
        .queryExecution.executedPlan
      assert(p.collect { case w: WindowExec => w }.isEmpty,
        s"the k-min cut must be the bounded aggregate, not a rank window:\n$p")
      assert(p.toString.contains("topk_pairs"),
        s"expected the topk_pairs partial/final aggregate:\n$p")
    }
  }

  test("corpus_source_overlap: shingle equi-join, no cartesian/BNLJ") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val p = graft.queries.R8bQueries
        .sourceOverlapResult(graft.queries.R8bQueries.sourceShingles(spark, sf))
        .queryExecution.executedPlan
      assert(p.collect { case c: CartesianProductExec => c }.isEmpty &&
        p.collect {
          case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
        s"pairwise overlap must be the shingle-keyed equi-join:\n$p")
    }
  }

  test("q6_revenue: all three predicates and the 4-column projection reach the scan") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val scans = plan("q6_revenue").collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "expected a parquet scan")
      val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
      Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount", "LessThan(l_quantity").foreach(f =>
        assert(pushed.contains(f), s"predicate $f must push to parquet: $pushed"))
      val readSchema = scans.head.metadata.getOrElse("ReadSchema", "")
      assert(!readSchema.contains("l_orderkey"),
        s"projection must prune to the 4 referenced columns: $readSchema")
    }
  }

  test("kmv/theta sub-k: a source with < k hashes yields NULL kth / θ=2^52 under ANSI") {
    // regression: element_at(arr, 64) on a shorter sketch array throws
    // INVALID_ARRAY_INDEX_IN_ELEMENT_AT under Spark 4's default ANSI mode;
    // the contract is a NULL kth_hash (kmv) / a 2^52 θ fallback (theta)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "this spec must run with the driver's default ANSI mode")
    val hashed = ((1L to 5L).map(h => ("tiny", h)) ++
      (1L to 200L).map(h => ("big", h * 7L))).toDF("source", "h")
    val kmv = graft.queries.R8bQueries.kmvResult(hashed)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(kmv("tiny").isNullAt(2) && kmv("tiny").isNullAt(3),
      s"sub-k source must surface NULL kth_hash and NULL kmv_est: ${kmv("tiny")}")
    assert(!kmv("big").isNullAt(2), s"k-full source keeps its kth minimum")
    // global pool has 203 distinct hashes >= k, so __merged__ is non-NULL here;
    // a fully sub-k pool must STILL emit the __merged__ row, with NULL kth
    val allTiny = (1L to 5L).map(h => ("tiny", h)).toDF("source", "h")
    val merged = graft.queries.R8bQueries.kmvResult(allTiny)
      .filter($"scope" === "__merged__").collect()
    assert(merged.length == 1 && merged.head.isNullAt(2),
      s"sub-k merged row must survive with NULL kth: ${merged.mkString}")
    val theta = graft.queries.R8bQueries.thetaPerSource(hashed)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(theta("tiny") == 4503599627370496L,
      s"sub-k source keeps θ = 2^52 (its sketch IS its set): ${theta("tiny")}")
    assert(theta("big") < 4503599627370496L)
  }

  test("q_chi_square: no window anywhere — pinned fold over the cell array") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val p = plan("q_chi_square")
      assert(p.collect { case w: WindowExec => w }.isEmpty,
        s"cross-cell order is pinned by array_sort + fold, not a window:\n$p")
    }
  }
}
