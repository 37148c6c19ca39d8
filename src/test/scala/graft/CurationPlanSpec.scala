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
}
