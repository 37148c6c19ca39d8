package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 fourth wave: plan pins for the TPC-H completion (Q4/Q9/Q12)
  * and a planted-frame check for the Markov transition matrix.
  */
class R9dPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def plan(key: String) =
    SparkEntry.queries(key)(spark, sf).queryExecution.executedPlan

  test("q4/q9/q12: decorrelated, no nested-loop anywhere") {
    Seq("q4_order_priority", "q9_product_profit", "q12_shipmode_priority")
      .foreach { k =>
        val p = plan(k)
        assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
          s"$k: cartesian product:\n$p")
        assert(p.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
          s"$k: broadcast nested loop:\n$p")
      }
  }

  // AQE wraps the plan in AdaptiveSparkPlanExec, whose inner tree is not
  // reachable via collect() before execution — pin on the plan STRING like
  // the sibling specs do.
  private def countLines(s: String, needle: String): Int =
    s.linesIterator.count(_.contains(needle))

  test("q4: the correlated EXISTS lands as ONE semi join carrying the " +
    "non-equi lateness condition") {
    val s = plan("q4_order_priority").toString
    assert(s.contains("LeftSemi"), s"missing semi join:\n$s")
    // the 30-day lateness predicate must ride in the join condition, not
    // re-execute per row: exactly one join node in the whole plan
    val joins = countLines(s, "Join")
    assert(joins === 1, s"expected exactly 1 join, got $joins:\n$s")
  }

  test("q9: all three dimension joins broadcast") {
    val s = plan("q9_product_profit").toString
    val bcasts = countLines(s, "BroadcastHashJoin")
    assert(bcasts >= 3,
      s"part/supplier/nation should broadcast (got $bcasts):\n$s")
  }

  test("markov transitions: planted sequence counts") {
    // user 1: a->b->a->b ; user 2: a->a. Transitions: a->b x2, b->a x1,
    // a->a x1 (cross-user adjacency must NOT leak).
    val ev = Seq(
      (1L, 1L, 10L, "a"), (2L, 1L, 20L, "b"),
      (3L, 1L, 30L, "a"), (4L, 1L, 40L, "b"),
      (5L, 2L, 10L, "a"), (6L, 2L, 20L, "a"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
    val got = ev
      .withColumn("dst", lead("event_type", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts_us", "event_id")))
      .filter(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("a", "b", 2L), ("b", "a", 1L), ("a", "a", 1L)))
  }

  test("winnowing pairs: a planted 20-token overlap is reported, " +
    "disjoint docs are not") {
    def toks(n: Int, p: String) = (0 until n).map(i => s"$p$i").mkString(" ")
    val shared = toks(20, "s")
    val docs = Seq(
      (1L, shared + " " + toks(15, "a")),
      (2L, toks(15, "b") + " " + shared),
      (3L, toks(40, "z")))
      .toDF("doc_id", "text")
    val got = graft.ext.Dedup.winnowingPairs(docs, minShared = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("winnowing pairs: a hash present in more docs than the cap is " +
    "excluded from pairing (boilerplate defense)") {
    def toks(n: Int, p: String) = (0 until n).map(i => s"$p$i").mkString(" ")
    val boiler = toks(20, "s") // in ALL docs -> its hashes exceed cap=2
    val docs = (1L to 4L).map(i => (i, boiler + " " + toks(15, s"u$i")))
      .toDF("doc_id", "text")
    val capped = graft.ext.Dedup.winnowingPairs(docs, minShared = 1,
      hashCap = 2)
    assert(capped.count() === 0,
      "boilerplate-only overlap must not pair under the cap")
    val uncapped = graft.ext.Dedup.winnowingPairs(docs, minShared = 1,
      hashCap = 1000)
    assert(uncapped.count() === 6, "all 6 pairs share the planted run")
  }

  test("markov transitions: window partitions by user (no global window)") {
    val s = plan("q_markov_transitions").toString
    val winLines = s.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.nonEmpty, s"expected a WindowExec:\n$s")
    // every window must be user-partitioned — a 'No Partition Defined'
    // global window would move the whole stream to one partition
    winLines.foreach { l =>
      assert(l.contains("user_id"), s"window not user-partitioned: $l")
    }
  }
}
