package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The RangeBinJoin optimizer rule: a natural banded range join must plan
  * as a binned equi-join (no nested-loop), return exactly the nested-loop
  * result, and leave non-rewritable shapes alone.
  */
class RangeBinJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // AQE off around plan assertions so the static plan is inspectable
  // (the adaptive wrapper hides the join until execution)
  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
  private def noAqe(body: => Unit): Unit =
    withConf("spark.sql.adaptive.enabled" -> "false")(body)

  private def hasBnlj(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.collect {
      case b: BroadcastNestedLoopJoinExec => b
    }.nonEmpty

  private lazy val a = Seq((1L, 100L), (2L, 250L), (3L, 260L), (4L, 999L))
    .toDF("a_id", "a_ts")
  private lazy val b = Seq((10L, 120L), (11L, 240L), (12L, 900L), (13L, 95L))
    .toDF("b_id", "b_ts")

  private def banded(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, col("b_ts") > col("a_ts") && col("b_ts") <= col("a_ts") + 50L)
      .select("a_id", "b_id")

  test("banded range join rewrites to a binned equi-join, result-identical") {
    noAqe {
      val rewritten = banded(a, b)
      assert(!hasBnlj(rewritten), "rule must eliminate the nested-loop join:\n" +
        rewritten.queryExecution.executedPlan)
      assert(rewritten.queryExecution.optimizedPlan.toString.contains("graft_bin"))
      val expected = withRuleDisabled {
        val e = banded(a, b)
        assert(hasBnlj(e), "control run must be the nested-loop plan:\n" +
          e.queryExecution.executedPlan)
        e.as[(Long, Long)].collect().toSet
      }
      assert(rewritten.as[(Long, Long)].collect().toSet === expected)
      // hand-checked: only a=100 has a b_ts in its (a_ts, a_ts+50] band (120)
      assert(expected === Set((1L, 10L)))
    }
  }

  test("band boundaries are exact at bin edges") {
    // pairs straddling a bin boundary must still match: width = 50,
    // a_ts=250 (bin 5) with b_ts=251..300 (bins 5..6, crosses 300)
    val l = Seq((1L, 250L)).toDF("a_id", "a_ts")
    val r = (245L to 305L).map(t => (t, t)).toDF("b_id", "b_ts")
    val got = banded(l, r).as[(Long, Long)].collect().map(_._2).sorted
    assert(got === (251L to 300L).toArray, s"got ${got.mkString(",")}")
  }

  test("equi-key joins and one-sided bands are left alone") {
    val l = Seq((1L, 10L)).toDF("k", "a_ts")
    val r = Seq((1L, 12L)).toDF("k2", "b_ts")
    // equi conjunct present → no rewrite (plan uses the hash key, and the
    // graft_bin column must not appear)
    val eq = l.join(r, col("k") === col("k2") && col("b_ts") >= col("a_ts"))
    assert(!eq.queryExecution.optimizedPlan.toString.contains("graft_bin"))
    // one-sided band → unbounded reach → no rewrite
    val oneSided = l.join(r, col("b_ts") > col("a_ts"))
    assert(!oneSided.queryExecution.optimizedPlan.toString.contains("graft_bin"))
    assert(oneSided.count() === 1L)
  }

  test("negative domains bin correctly (Pmod floor division, not truncation)") {
    // values straddling zero: truncating division would fold bins −1 and 0
    // together and lose pairs at the boundary; floor division must not
    val l = Seq((1L, -60L), (2L, -10L), (3L, 5L), (4L, 40L)).toDF("a_id", "a_ts")
    val r = (-70L to 70L by 7L).map(t => (t, t)).toDF("b_id", "b_ts")
    noAqe {
      val got = banded(l, r).as[(Long, Long)].collect().toSet
      val expected = withRuleDisabled {
        banded(l, r).as[(Long, Long)].collect().toSet
      }
      assert(got === expected, s"got $got expected $expected")
      assert(expected.nonEmpty && expected.contains((2L, -7L)),
        "cross-zero band (−10, 40] must match b_ts = −7")
    }
  }

  test("rule honors the disable flag") {
    noAqe {
      withRuleDisabled {
        assert(hasBnlj(banded(a, b)))
      }
    }
  }

  private def withRuleDisabled[T](body: => T): T = {
    spark.conf.set("spark.graft.rangeBinJoin.enabled", "false")
    try body finally spark.conf.set("spark.graft.rangeBinJoin.enabled", "true")
  }
}
