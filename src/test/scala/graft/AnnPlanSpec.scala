package graft

import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions for the ANN ranking path: the per-query top-k
  * must run as a partial/final bounded aggregate (`topk_pairs`), never as a
  * `Window.partitionBy(q_id)` — a window funnels the whole scored set for a
  * query into ONE task (parallelism capped at |queries|), which does not
  * survive a 100× corpus scale-up.
  */
class AnnPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def withStaticPlan(body: => Unit): Unit = {
    // AQE's AdaptiveSparkPlanExec hides the real operators from collect();
    // disable it so the static physical plan is inspectable (JoinPlanSpec
    // does the same)
    val key = "spark.sql.adaptive.enabled"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def assertNoPerQueryWindow(key: String): Unit = withStaticPlan {
    val plan = SparkEntry.queries(key)(spark, sf).queryExecution.executedPlan
    // NO WindowExec anywhere: ranking runs as the bounded topk_pairs
    // aggregate, cell assignment as a max_by argmax, and rep selection as a
    // min_by aggregate — every per-group funnel is a partial/final agg
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.isEmpty,
      s"$key must not contain any WindowExec (per-group funnel):\n${windows.mkString("\n")}")
    val topks = plan.collect {
      case a: ObjectHashAggregateExec
          if a.aggregateExpressions.exists(
            _.aggregateFunction.isInstanceOf[graft.functions.TopKPairs]) => a
    }
    assert(topks.nonEmpty, s"$key should rank via the bounded topk_pairs aggregate")
    // the aggregate must run in two phases (Partial map-side, Final after the
    // shuffle) so the exchange carries at most |Q|·partitions·k pairs
    val modes = topks.flatMap(_.aggregateExpressions.map(_.mode.toString)).toSet
    assert(modes.contains("Partial") && modes.contains("Final"),
      s"$key topk_pairs must be partial+final, got $modes")
  }

  test("ann_brute_force ranks via bounded partial/final topk_pairs, no q_id window") {
    assertNoPerQueryWindow("ann_brute_force")
  }

  test("ann_pq ADC cut and re-rank avoid q_id windows") {
    assertNoPerQueryWindow("ann_pq")
  }

  test("ann_ivf_pq avoids q_id windows") {
    assertNoPerQueryWindow("ann_ivf_pq")
  }

  test("the rest of the ANN family avoids q_id windows too") {
    Seq("ann_lsh", "ann_lsh_multiprobe", "ann_ivf", "ann_ivf_nprobe",
      "ann_ivf_trained",
      "ann_ivf_pq_residual", "ann_pq_trained", "ann_ivf_pq_trained",
      "ann_ivf_pq_residual_trained", "ann_recall", "ann_ivf_persisted",
      "ann_ivf_pq_persisted", "ann_ivf_pq_nprobe",
      "ann_ivf_pq_residual_nprobe", "ann_ivf_pq_full", "ann_sq8",
      "ann_ivf_sq8", "ann_ivf_sq8_nprobe", "ann_ivf_sq8_persisted")
      .foreach(assertNoPerQueryWindow)
  }

  test("IVF cell assignment is a narrow projection: zero exchanges, zero joins") {
    withStaticPlan {
      // read the table directly: Synth's loader repartitions small files
      // (a source artifact, not part of the assignment plan under test)
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val cents = Array.tabulate(4, 64)((j, i) => (j * 64 + i + 1) / 100.0)
      val plan = graft.ext.Similarity.assignCells(e, cents)
        .queryExecution.executedPlan
      val ex = plan.collect {
        case x: org.apache.spark.sql.execution.exchange.Exchange => x
      }
      assert(ex.isEmpty,
        s"assignment must not exchange (it is a row-local argmax):\n$plan")
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }
      assert(joins.isEmpty, s"assignment must not join:\n$plan")
    }
  }

  test("ann_ivf end-to-end: only the topk shuffle + output sort exchange remain") {
    withStaticPlan {
      Seq("ann_ivf", "ann_ivf_trained").foreach { key =>
        val plan = SparkEntry.queries(key)(spark, sf).queryExecution.executedPlan
        // ignore Synth's small-file RoundRobin repartitions (loader artifact)
        val shuffles = plan.collect {
          case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
              if !s.outputPartitioning.isInstanceOf[
                org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning] => s
        }
        assert(shuffles.length == 2,
          s"$key: expected exactly the topk partial/final shuffle + the orderBy " +
            s"range exchange, got ${shuffles.length}:\n$plan")
        val bcasts = plan.collect {
          case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
        }
        assert(bcasts.length == 1,
          s"$key: only the tiny assigned query side should broadcast, " +
            s"got ${bcasts.length}:\n$plan")
      }
    }
  }

  test("topk_pairs: ordering, ties, null-skip, and cross-partition merge") {
    import spark.implicits._
    // 1000 scored rows per query across 4 partitions; planted best ids
    val scored = spark.range(0, 1000, 1, 4)
      .select(
        (col("id") % 2).as("q_id"),
        col("id").as("n_id"),
        // score descends with id, so top-3 per query = lowest ids; one tie
        // pair (ids 0 and 2 both score 1.0 for q 0) exercises id tie-break
        when(col("id") <= 2, 1.0).otherwise(lit(1.0) - col("id") / lit(10000.0))
          .as("sim"))
    val top = scored.groupBy("q_id")
      .agg(call_function("topk_pairs", col("n_id"), col("sim"), lit(3), lit(false))
        .as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("pos"), col("col.n_id").as("n_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // q 0: ids 0 and 2 tie at 1.0 -> lower id first, then id 4
    // q 1: id 1 scores 1.0, then descending -> 3, 5
    assert(top == Set((0L, 0, 0L), (0L, 1, 2L), (0L, 2, 4L),
      (1L, 0, 1L), (1L, 1, 3L), (1L, 2, 5L)))
    // null scores are skipped, never ranked
    val withNulls = scored.withColumn("sim",
      when(col("n_id") < 6, lit(null).cast("double")).otherwise(col("sim")))
    val top2 = withNulls.groupBy("q_id")
      .agg(call_function("topk_pairs", col("n_id"), col("sim"), lit(1), lit(false))
        .as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("col.n_id").as("n_id"))
      .collect().map(_.getLong(0)).toSet
    assert(top2 == Set(6L, 7L))
  }

  test("nn-descent: every window is partitioned, re-rank is topk_pairs, descent improves") {
    withStaticPlan {
      graft.functions.GraftFunctions.ensureRegistered(spark)
      val e = graft.queries.Synth.embeddings(spark, sf)
      val init = graft.ext.Similarity.nnDescent(e, 8, 0)
      // pin the ROUND's plan pre-checkpoint (the looped key's executed plan
      // is just the checkpointed-RDD scan)
      val round = graft.ext.Similarity.nnDescentRound(
        e.select(col("vec_id"), col("embedding")), init, 8)
      val p = round.queryExecution.executedPlan
      val g = graft.ext.Similarity.nnDescent(e, 8, 1)
      // the only windows allowed are the per-node reverse cap — PARTITIONED
      // (by the neighbor id); an unpartitioned window would serialize the
      // corpus into one task
      p.collect { case w: WindowExec => w }.foreach(w =>
        assert(w.partitionSpec.nonEmpty, s"unpartitioned window:\n$w"))
      assert(p.toString.contains("topk_pairs"),
        s"the re-rank must be the bounded aggregate:\n$p")
      // per-node degree bound: k neighbors per node, always
      val over = g.groupBy("vec_id").count().filter(col("count") > 8).count()
      assert(over == 0, "no node may exceed k neighbors")
    }
  }

  test("topk_pairs ascending mode ranks smallest distances first") {
    import spark.implicits._
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 1.0), (1L, 12L, 3.0))
      .toDF("q_id", "n_id", "d")
    val got = df.groupBy("q_id")
      .agg(call_function("topk_pairs", col("n_id"), col("d"), lit(2), lit(true))
        .as("top"))
      .select(posexplode(col("top")))
      .select(col("col.n_id")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(11L, 12L))
  }
}
