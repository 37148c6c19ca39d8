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

  test("hard negatives: every returned neighbor has a different label") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"))
    val bad = graft.ext.Similarity.hardNegatives(e, e.filter(col("vec_id") < 10), 5)
      .join(q, "q_id")
      .join(e.select(col("vec_id").as("n_id"), col("label").as("n_label")), "n_id")
      .filter(col("q_label") === col("n_label"))
    assert(bad.count() === 0)
  }

  test("mmr: a planted redundant cluster is diversified") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // corpus: 3 near-identical vectors close to the query (the redundant
    // cluster) + 2 moderately-relevant distinct directions. Plain top-3
    // takes the whole cluster; MMR (λ=0.7) must spend picks 2-3 on the
    // distinct directions instead of the 2nd/3rd cluster copies.
    // geometry: cluster at ~32° from the query with near-zero internal
    // spread (redundancy term ≈ 1 after the first pick), alternatives at
    // ~33° from the query but ~65° from the cluster — relevant enough to
    // be candidates, far enough that 0.7·sim − 0.3·msim prefers them
    def v(x: Double, y: Double, z: Double) = Array(x.toFloat, y.toFloat, z.toFloat)
    val rows = Seq(
      (0L, v(1, 0, 0)),              // query
      (1L, v(0.848, 0.530, 0.0)),    // cluster a
      (2L, v(0.848, 0.530, 0.001)),  // cluster b (near-dup of a)
      (3L, v(0.848, 0.530, 0.002)),  // cluster c (near-dup of a)
      (4L, v(0.84, -0.54, 0.0)),     // distinct direction 1
      (5L, v(0.84, 0.0, -0.54)))     // distinct direction 2
    val e = rows.toDF("vec_id", "embedding")
    val got = graft.ext.Similarity
      .mmrDiversify(e, e.filter(col("vec_id") === 0L), kCand = 5, kOut = 3)
      .orderBy("sel_rank")
      .select("n_id").as[Long].collect().toSeq
    assert(got.head >= 1L && got.head <= 3L, s"first pick must be the most relevant: $got")
    assert(got.tail.toSet === Set(4L, 5L),
      s"picks 2-3 must diversify out of the cluster: $got")
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
