package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions for the round-6 curation/dedup keys: no
  * per-group WindowExec funnel and no non-broadcast cartesian anywhere —
  * every per-group decision runs as a partial/final aggregate or an
  * equi-join, the shapes that survive a 100× corpus scale-up. (1-row
  * broadcast cross joins — corpus totals — are BroadcastNestedLoopJoin,
  * not CartesianProductExec, and are allowed.)
  */
class CurationPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def assertScaleShape(key: String): Unit = {
    val old = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries(key)(spark, sf).queryExecution.executedPlan
      val windows = plan.collect { case w: WindowExec => w }
      assert(windows.isEmpty,
        s"$key must not contain WindowExec:\n${windows.mkString("\n")}")
      val cartesian = plan.collect { case c: CartesianProductExec => c }
      assert(cartesian.isEmpty,
        s"$key must not contain a non-broadcast cartesian:\n${cartesian.mkString("\n")}")
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("r6 curation/dedup keys: no window funnel, no cartesian") {
    Seq("dedup_semantic", "dedup_cross_source", "corpus_chunk_dedup",
      "corpus_select_top_quality", "text_bigram_lm", "corpus_chunk")
      .foreach(assertScaleShape)
  }

  test("r7 selection keys: no window funnel, no cartesian") {
    Seq("corpus_quality_classifier", "corpus_dsir_importance",
      "corpus_temperature_sample", "dedup_bloom_prefilter",
      "corpus_select_pipeline", "corpus_line_dedup", "dedup_cluster_stats",
      "dedup_minhash_jaccard_est", "dedup_containment", "q_funnel",
      "classifier_holdout_accuracy")
      .foreach(assertScaleShape)
  }

  test("classifier scoring is a pure narrow projection: zero exchanges, zero joins") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text", "CAST(doc_id % 5 = 0 AS BIGINT) AS y")
    val plan = graft.ext.Selection
      .scoreQuality(docs, Array(0.1, 0.2, 0.3, 0.4))
      .queryExecution.executedPlan
    val ex = plan.collect {
      case x: org.apache.spark.sql.execution.exchange.Exchange => x
    }
    assert(ex.isEmpty, s"scoring must not exchange:\n$plan")
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, s"scoring must not join:\n$plan")
  }

  test("DSIR scoring pass has no joins (bucket stats are plan literals)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text", "CAST(doc_id % 5 = 0 AS BIGINT) AS y")
    val plan = graft.ext.Selection.dsirBits(docs)
      .queryExecution.executedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty,
      s"DSIR per-doc scoring must not join (stats are literals):\n$plan")
  }
}
