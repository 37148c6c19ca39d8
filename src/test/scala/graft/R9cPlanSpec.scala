package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 third wave: winnowing's detection guarantee on planted docs,
  * and decorrelation pins for the adapted TPC-H subquery suite — every
  * correlated subquery must land as a JOIN (semi/anti/equi), never a
  * nested-loop re-execution.
  */
class R9cPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def plan(key: String) =
    SparkEntry.queries(key)(spark, sf).queryExecution.executedPlan

  private def toks(n: Int, p: String): String =
    (0 until n).map(i => s"$p$i").mkString(" ")

  test("winnowing guarantee: a shared 8-token run yields a common hash") {
    // w + k - 1 = 4 + 5 - 1 = 8: any shared run of 8 tokens contains one
    // full window of 4 shared grams, whose selected MIN hash is position-
    // independent — so it lands in both docs' fingerprint hash sets
    val shared = (4 until 12).map(i => s"a$i").mkString(" ")
    val docs = Seq(
      (1L, toks(20, "a")),                                 // contains a4..a11
      (2L, toks(10, "b") + " " + shared + " " + toks(10, "c")))
      .toDF("doc_id", "text")
    val sel = graft.ext.TextAnalysis.winnowingSelections(docs)
      .select("doc_id", "h").as[(Long, Long)].collect()
    val h1 = sel.filter(_._1 == 1L).map(_._2).toSet
    val h2 = sel.filter(_._1 == 2L).map(_._2).toSet
    assert((h1 & h2).nonEmpty,
      s"no common fingerprint despite an 8-token shared run:\n$h1\n$h2")
  }

  test("winnowing: disjoint docs share nothing; density ~ 2/(w+1)") {
    val docs = Seq((1L, toks(60, "x")), (2L, toks(60, "y")))
      .toDF("doc_id", "text")
    val sel = graft.ext.TextAnalysis.winnowingSelections(docs)
      .select("doc_id", "h").as[(Long, Long)].collect()
    val h1 = sel.filter(_._1 == 1L).map(_._2).toSet
    val h2 = sel.filter(_._1 == 2L).map(_._2).toSet
    assert((h1 & h2).isEmpty, "40-bit hashes should not collide here")
    val fp = graft.ext.TextAnalysis.winnowingFingerprints(docs)
      .as[(Long, Long, Long, String)].collect()
    fp.foreach { case (_, nGrams, nFp, _) =>
      assert(nGrams === 56L)
      // expectation is 2/(w+1) = 0.4; allow a wide deterministic band
      assert(nFp >= 14 && nFp <= 34, s"implausible density: $nFp/$nGrams")
    }
  }

  test("winnowing: rightmost-min tie-break on an all-equal-hash doc") {
    // 12 identical tokens -> 8 identical grams; each window [p, p+3] must
    // select its RIGHTMOST position p+3 (Schleimer et al. rule 2)
    val docs = Seq((9L, ("x " * 12).trim)).toDF("doc_id", "text")
    val sel = graft.ext.TextAnalysis.winnowingSelections(docs)
      .select("h", "sel_pos").as[(Long, Long)].collect()
    assert(sel.map(_._1).toSet.size === 1, "all grams hash equal")
    assert(sel.map(_._2).toSet === Set(4L, 5L, 6L, 7L, 8L))
    val fp = graft.ext.TextAnalysis.winnowingFingerprints(docs)
      .as[(Long, Long, Long, String)].collect().head
    assert(fp === ((9L, 8L, 5L, fp._4)))
  }

  test("TPC-H subquery suite: decorrelated, no nested-loop anywhere") {
    val keys = Seq("q2_min_cost_supplier", "q11_important_parts",
      "q13_customer_distribution", "q16_parts_supplier_count",
      "q17_small_quantity", "q19_disjunctive_revenue",
      "q20_excess_suppliers", "q21_sole_blame_supplier",
      "q22_no_urgent_customers")
    keys.foreach { k =>
      val p = plan(k)
      assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
        s"$k: cartesian product:\n$p")
      assert(p.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
        s"$k: broadcast nested loop — a correlated subquery survived " +
          s"decorrelation:\n$p")
    }
  }

  test("q21: the EXISTS and NOT EXISTS land as semi + anti joins") {
    val s = plan("q21_sole_blame_supplier").toString
    assert(s.contains("LeftSemi"), s"missing semi join:\n$s")
    assert(s.contains("LeftAnti"), s"missing anti join:\n$s")
  }

  test("q13: the zero-order bucket survives the LEFT join") {
    // a customer whose ONLY orders are 1-URGENT must count as c_count=0,
    // not vanish: pin on a planted frame through the same SQL
    Seq((1L, "c1"), (2L, "c2")).toDF("c_custkey", "c_name")
      .createOrReplaceTempView("graft_th_customer_t")
    Seq((10L, 1L, "1-URGENT"), (11L, 1L, "1-URGENT"), (12L, 2L, "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
      .createOrReplaceTempView("graft_th_orders_t")
    val r = spark.sql(
      """WITH co AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM graft_th_customer_t LEFT JOIN graft_th_orders_t
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist FROM co GROUP BY c_count
        |ORDER BY c_count""".stripMargin)
      .as[(Long, Long)].collect().toSeq
    assert(r === Seq((0L, 1L), (1L, 1L)))
  }
}
