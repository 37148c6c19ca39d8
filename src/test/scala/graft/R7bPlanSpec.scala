package graft

import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning}
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the second round-7 relational wave: each key
  * exists partly FOR its plan shape, so the shape is asserted.
  */
class R7bPlanSpec extends AnyFunSuite {
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

  test("q_global_sort range-partitions — total order with no single-task funnel") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val plan = SparkEntry.queries("q_global_sort")(spark, sf)
        .queryExecution.executedPlan
      val rangeEx = plan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
      }
      assert(rangeEx.nonEmpty, s"global sort must range-partition:\n$plan")
      assert(rangeEx.head.outputPartitioning
        .asInstanceOf[RangePartitioning].numPartitions > 1,
        "range exchange must fan out across partitions, not funnel to one")
      assert(plan.collect { case s: SortExec if !s.global => s }.nonEmpty ||
        plan.collect { case s: SortExec => s }.nonEmpty)
    }
  }

  test("q_anomaly_zscore: moments broadcast back — no fact-side re-shuffle") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val plan = SparkEntry.queries("q_anomaly_zscore")(spark, sf)
        .queryExecution.executedPlan
      assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
        s"per-type stats must broadcast over the stream:\n$plan")
      // the stats aggregate is partially combined below its shuffle
      val hashShuffles = plan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
      }
      hashShuffles.foreach { sh =>
        assert(sh.collect { case a: HashAggregateExec => a }.nonEmpty,
          s"stats shuffle without map-side combine:\n$sh")
      }
    }
  }

  test("q_scd2_build: ONE entity-key hash shuffle serves the whole history pass") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val plan = SparkEntry.queries("q_scd2_build")(spark, sf)
        .queryExecution.executedPlan
      val hashShuffles = plan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
      }
      // the source spread repartition is round-robin, not hash; the lead()
      // window is the only hash exchange in the pipeline
      assert(hashShuffles.size == 1,
        s"SCD2 build must shuffle once on the entity key, got ${hashShuffles.size}:\n$plan")
    }
  }

  test("q_percentile_cont: exact percentile aggregates partially map-side") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val plan = SparkEntry.queries("q_percentile_cont")(spark, sf)
        .queryExecution.executedPlan
      val partials = plan.collect {
        case a: ObjectHashAggregateExec
            if a.aggregateExpressions.exists(_.mode.toString == "Partial") => a
        case a: SortAggregateExec
            if a.aggregateExpressions.exists(_.mode.toString == "Partial") => a
      }
      assert(partials.nonEmpty,
        s"percentile must carry partial per-partition state, not raw rows:\n$plan")
    }
  }

  test("dedup_lsh_incremental: probe reads the PERSISTED band index, no cartesian") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
    val df = SparkEntry.queries("dedup_lsh_incremental")(spark, sf)
    val plan = df.queryExecution.executedPlan
    assert(plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty)
    assert(plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, "candidate generation must equi-join on (band, bucket)")
    // the standing side of the candidate join is the parquet INDEX scan
    // (band-partitioned), not a re-shingling of the standing corpus
    val indexScans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("lshinc")) => f
    }
    assert(indexScans.nonEmpty, s"probe must scan the persisted index:\n$plan")
    }
  }

  test("corpus_diversity_sample ranks via bounded topk_pairs, not a corpus window") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val plan = SparkEntry.queries("corpus_diversity_sample")(spark, sf)
        .queryExecution.executedPlan
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"periphery ranking must not window over the corpus:\n$plan")
      val partials = plan.collect {
        case a: ObjectHashAggregateExec
            if a.aggregateExpressions.exists(_.mode.toString == "Partial") => a
      }
      assert(partials.nonEmpty, "topk_pairs must aggregate partially map-side")
    }
  }

  test("dedup_edit_distance is a narrow pass — zero hash shuffles") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val plan = SparkEntry.queries("dedup_edit_distance")(spark, sf)
        .queryExecution.executedPlan
      val hashShuffles = plan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
      }
      assert(hashShuffles.isEmpty,
        s"pairwise verification is row-local — no shuffle justified:\n$plan")
    }
  }

  test("corpus_select_budget: every running sum is band-PARTITIONED — no global cumsum task") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val plan = SparkEntry.queries("corpus_select_budget")(spark, sf)
        .queryExecution.executedPlan
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty)
      windows.foreach { w =>
        assert(w.partitionSpec.nonEmpty,
          s"an UNPARTITIONED window = one serial task over the corpus:\n$w")
      }
    }
  }

  test("q_latest_by_key compacts via map-side-combined max_by — no window") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val plan = SparkEntry.queries("q_latest_by_key")(spark, sf)
        .queryExecution.executedPlan
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, "compaction must be an aggregate, not a per-key window sort")
      val partials = plan.collect {
        case a: HashAggregateExec
            if a.aggregateExpressions.exists(_.mode.toString == "Partial") => a
        case a: ObjectHashAggregateExec
            if a.aggregateExpressions.exists(_.mode.toString == "Partial") => a
        case a: SortAggregateExec
            if a.aggregateExpressions.exists(_.mode.toString == "Partial") => a
      }
      assert(partials.nonEmpty, s"max_by must combine map-side:\n$plan")
    }
  }

  test("q_lateral_explode and text_oov_rate scoring are narrow passes") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      Seq("q_lateral_explode", "text_oov_rate").foreach { key =>
        val plan = SparkEntry.queries(key)(spark, sf)
          .queryExecution.executedPlan
        val hashShuffles = plan.collect {
          case e: ShuffleExchangeExec
              if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
        }
        assert(hashShuffles.isEmpty,
          s"$key must not hash-shuffle (row-local fan-out/scoring):\n$plan")
      }
    }
  }

  test("q_first_last_window: all three IGNORE NULLS functions share ONE window") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val plan = SparkEntry.queries("q_first_last_window")(spark, sf)
        .queryExecution.executedPlan
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.size == 1, s"expected one WindowExec, got ${windows.size}")
      assert(windows.head.windowExpression.size == 3)
    }
  }

  test("q_upsert_merge: both sides compact BEFORE the join — no window, combined aggs") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val plan = SparkEntry.queries("q_upsert_merge")(spark, sf)
        .queryExecution.executedPlan
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, "latest-per-key must be an aggregate, not a window")
      val partials = plan.collect {
        case a: ObjectHashAggregateExec
            if a.aggregateExpressions.exists(_.mode.toString == "Partial") => a
        case a: HashAggregateExec
            if a.aggregateExpressions.exists(_.mode.toString == "Partial") => a
        case a: SortAggregateExec
            if a.aggregateExpressions.exists(_.mode.toString == "Partial") => a
      }
      assert(partials.size >= 2, "both merge sides must compact map-side")
    }
  }

  test("multimodal_phash_dedup: aHash is 2×-upscale INVARIANT, brightness-robust") {
    val rows = SparkEntry.queries("multimodal_phash_dedup")(spark, sf).collect()
    assert(rows.length == 50)
    // ⌊⌊k·t⌋/k⌋ = ⌊t⌋ makes the NN resample grid identical → Hamming 0
    assert(rows.forall(_.getLong(2) == 0L),
      s"2× upscale must hash identically, got ${rows.map(_.getLong(2)).max}")
    // a +8 red shift moves luma ≤ 2 units — only cells straddling the
    // mean can flip; the distance stays well inside the near-dup band
    assert(rows.forall(_.getLong(3) <= 10L))
    assert(rows.forall(r => r.getBoolean(4) && r.getBoolean(5)))
  }

  test("text_compression_ratio separates planted boilerplate from natural text") {
    val rows = SparkEntry.queries("text_compression_ratio")(spark, sf).collect()
    assert(rows.length == 500)
    val (planted, natural) = rows.partition(_.getLong(0) % 8 == 0)
    // 40× repeated phrase deflates to a tiny fraction; token-soup text
    // stays comparatively incompressible
    assert(planted.forall(_.getLong(3) < 2000),
      s"repetitive docs must compress hard, worst ${planted.map(_.getLong(3)).max}")
    assert(natural.forall(_.getLong(3) > 2000),
      s"natural docs must not flag, best ${natural.map(_.getLong(3)).min}")
    assert(planted.forall(_.getBoolean(4)) && natural.forall(!_.getBoolean(4)))
  }

  test("q_recursive_cte: ancestor walk terminates with per-user log-depth rows") {
    val rows = SparkEntry.queries("q_recursive_cte")(spark, sf).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, rs) =>
      // depth 0 self-row, then halving chain down to 0
      val chain = rs.sortBy(_.getInt(2)).map(_.getLong(1))
      assert(chain.head == u)
      chain.sliding(2).foreach {
        case Array(a, b) => assert(b == a / 2)
        case _ =>
      }
      assert(chain.last == 0L)
    }
  }

  test("q_dynamic_partition_pruning: the fact scan carries a runtime pruning filter") {
    // the DPP cost heuristic compares pruned bytes against subquery
    // overhead — meaningless at test-corpus size, so force the benefit
    // estimate up; at production scale the default heuristic fires on its
    // own (the exhibit pins that the PLAN SHAPE is reachable, the layout
    // is right, and the pruned result is correct)
    withConf("spark.sql.adaptive.enabled" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "100000") {
      val df = SparkEntry.queries("q_dynamic_partition_pruning")(spark, sf)
      val scans = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains("graft-dpp/fact")) => f
      }
      assert(scans.nonEmpty, "fact scan not found")
      val pruned = scans.exists(_.partitionFilters.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])))
      assert(pruned,
        s"fact partitionFilters must contain a DynamicPruningExpression:\n${
          scans.map(_.partitionFilters).mkString("\n")}")
      // and the pruned read equals the static answer
      assert(df.collect().map(_.getLong(1)).sum ==
        graft.queries.Synth.events(spark, sf)
          .filter(org.apache.spark.sql.functions.col("event_type")
            .isin("purchase", "signup")).count())
    }
  }

  test("src_orc_roundtrip preserves the typed stream bit-for-bit") {
    val dir = sf
    val out = SparkEntry.queries("src_orc_roundtrip")(spark, dir).collect()
    assert(out.length == 5 && out.map(_.getLong(1)).sum == 1000L)
    // spot-check: the ORC-read rows equal the parquet-read rows exactly
    val back = spark.read.orc(graft.queries.CoreQueries.OrcSlot)
      .orderBy("event_id").collect()
    val orig = graft.queries.Synth.eventsTs(spark, dir)
      .select(back.head.schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
      .orderBy("event_id").collect()
    assert(back.toSeq == orig.toSeq, "ORC round-trip must be lossless")
  }
}
