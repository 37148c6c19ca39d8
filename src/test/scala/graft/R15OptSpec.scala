package graft

import graft.ext.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 optimization parity proofs — every rewrite this round must be
  * row-identical to the shape it replaced (the oracle gate must never be
  * the first place a divergence shows up):
  *   - message-form nnDescent round ≡ the r14 relational round
  *   - topk_pairs_distinct ≡ .distinct() + topk_pairs
  *   - SinkSortLocal demotes ONLY the sink-adjacent global sort
  *   - Bench contract line shape (the driver's stdout tail parse)
  *   - Lineage.cut reliable-mode strategy switch
  */
class R15OptSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic pseudo-random embeddings with HUBS (node 0 is in many
  // neighbor lists → exercises the reverse k-cap and the asymmetric-edge
  // paths of the message form)
  private def synthEmb(n: Int, dim: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val v = Array.tabulate(dim)(d =>
        (((i * 1103515245L + d * 12345L + 7L) % 1000L) - 500L).toFloat / 500f)
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
  }

  private def edgeSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("nnDescentRound (message form) equals the r14 relational round") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val e = synthEmb(60, 8)
    val vecs = e.select(col("vec_id"), col("embedding"))
    // ring init, k=4 — then TWO chained rounds so round 2 sees a
    // non-uniform in-degree distribution (hubs → real reverse-cap cuts)
    val k = 4
    val ring = e.select(col("vec_id"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .select(col("vec_id"), ((col("vec_id") + col("j")) % 60).as("n_id"))
    var fast: DataFrame = ring.localCheckpoint(true)
    var ref: DataFrame = ring.localCheckpoint(true)
    (1 to 2).foreach { round =>
      fast = Similarity.nnDescentRound(vecs, fast, k).localCheckpoint(true)
      ref = Similarity.nnDescentRoundRef(vecs, ref, k).localCheckpoint(true)
      assert(edgeSet(fast) == edgeSet(ref),
        s"round $round diverged: only-fast=" +
          s"${(edgeSet(fast) -- edgeSet(ref)).take(5)} only-ref=" +
          s"${(edgeSet(ref) -- edgeSet(fast)).take(5)}")
    }
  }

  test("nnDescent full loop (LSH-seeded) equals loop over reference rounds") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val e = synthEmb(40, 8)
    val planes = Similarity.hyperplanes(nPlanes = 6, dim = 8)
    val got = Similarity.nnDescent(e, 8, 2, Some(planes))
    // reference: same init (iters=0 shares it), then reference rounds
    val init = Similarity.nnDescent(e, 8, 0, Some(planes))
    var ref = init.localCheckpoint(true)
    val vecs = e.select(col("vec_id"), col("embedding"))
    (1 to 2).foreach { _ =>
      ref = Similarity.nnDescentRoundRef(vecs, ref, 8).localCheckpoint(true)
    }
    assert(edgeSet(got) == edgeSet(ref))
  }

  test("topk_pairs_distinct == distinct + topk_pairs (dup-heavy input)") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // duplicates deliberately outnumber k so a naive trim would evict a
    // unique pair that belongs in the distinct top-k
    val base = (0 until 40).map(i => (1L, i.toLong, (i % 7).toDouble))
    val dups = base ++ base ++ base.take(20) ++
      Seq((2L, 5L, 1.0), (2L, 5L, 1.0), (2L, 6L, 1.0), (2L, 4L, 2.0))
    val df = dups.toDF("q_id", "n_id", "sim").repartition(7)
    def explodeTop(d: DataFrame, fn: String): Seq[(Long, Long, Double)] = d
      .groupBy("q_id")
      .agg(call_function(fn, col("n_id"), col("sim"), lit(3), lit(false)).as("t"))
      .select(col("q_id"), posexplode(col("t")))
      .select(col("q_id"), col("pos"), col("col.n_id"), col("col.score"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
      .sortBy(t => (t._1, t._3, t._2))
    val got = explodeTop(df, "topk_pairs_distinct")
    val ref = explodeTop(df.distinct(), "topk_pairs")
    assert(got == ref)
  }

  // ------------------------------------------------ SinkSortLocal rule

  /** Capture the optimized logical plan of the next noop write. */
  private def optimizedPlanOfWrite(df: DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    @volatile var captured: Option[
      org.apache.spark.sql.execution.QueryExecution] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = captured = Some(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      df.write.format("noop").mode("overwrite").save()
      val deadline = System.nanoTime() + 10L * 1000000000L
      while (captured.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      assert(captured.nonEmpty, "write's QueryExecution never arrived")
      captured.get.optimizedPlan
    } finally spark.listenerManager.unregister(listener)
  }

  test("SinkSortLocal: noop write demotes the trailing global sort") {
    import org.apache.spark.sql.catalyst.plans.logical.Sort
    val df = spark.range(0, 1000).toDF("id")
      .select(col("id"), (col("id") % 7).as("g"))
      .groupBy("g").agg(sum("id").as("s"))
      .orderBy("g")
    // a collect keeps the global order — the rule only fires under writes
    val collected = df.collect().map(_.getLong(0)).toSeq
    assert(collected == collected.sorted, "collect() must stay globally sorted")
    val plan = optimizedPlanOfWrite(df)
    val sorts = plan.collect { case s: Sort => s }
    assert(sorts.nonEmpty, s"expected a (local) sort at the sink:\n$plan")
    assert(sorts.forall(!_.global), s"sink sort must be demoted:\n$plan")
  }

  test("SinkSortLocal: orderBy+limit (top-k) keeps its global sort") {
    import org.apache.spark.sql.catalyst.plans.logical.Sort
    val limited = spark.range(0, 100).toDF("id").orderBy(desc("id")).limit(5)
    val plan = optimizedPlanOfWrite(limited)
    val sorts = plan.collect { case s: Sort => s }
    assert(sorts.nonEmpty && sorts.forall(_.global),
      s"top-k sort must stay global (row set depends on it):\n$plan")
  }

  test("SinkSortLocal: disabled via conf keeps the global sink sort") {
    import org.apache.spark.sql.catalyst.plans.logical.Sort
    spark.conf.set("spark.graft.sinkSortLocal.enabled", "false")
    try {
      val plan = optimizedPlanOfWrite(
        spark.range(0, 100).toDF("id").orderBy(desc("id")))
      val sorts = plan.collect { case s: Sort => s }
      assert(sorts.nonEmpty && sorts.forall(_.global),
        s"kill-switch must restore the global sort:\n$plan")
    } finally spark.conf.unset("spark.graft.sinkSortLocal.enabled")
  }

  // ------------------------------------------------- Bench contract

  test("Bench stdout line: single line, leading metric token, parseable") {
    val results = Seq(("q1_agg", 1.5, 1.0), ("ann_ivf", 2.0, 1.9),
      ("zz_custom", 0.4, 0.3))
    val line = Bench.renderStdoutLine(results, Seq("bad_key"), 1, 0,
      "BENCH_full.json", "/root/testdata/sf0.1")
    assert(!line.contains("\n"), "must be ONE line")
    assert(line.startsWith("""{"metric":"total","value":"""),
      s"leading token moved: $line")
    assert(line.endsWith("}"))
    assert(line.contains(""""errors":["bad_key"]"""))
    assert(line.contains(""""queries":{"""))
    assert(line.contains(""""ann_ivf":1.90"""))
    // the driver's tail capture is ~2000 chars — the real line with the
    // full 60-key baseline map must fit; this synthetic one trivially does
    assert(line.length < 1900)
  }

  test("Bench full-file JSON: every key present warm and cold") {
    val results = Seq(("a", 1.25, 1.0), ("b", -1.0, -1.0))
    val txt = Bench.renderFullJson(results, Seq("b"), Seq("a"), "sf")
    assert(txt.startsWith("""{"metric":"total","value":1.000"""))
    assert(txt.contains(""""queries":{"a":1.000,"b":-1.000}"""))
    assert(txt.contains(""""queries_cold":{"a":1.250,"b":-1.000}"""))
    assert(txt.contains(""""errors":["b"]"""))
    assert(txt.contains(""""retried":["a"]"""))
    assert(!txt.contains("\n"))
  }

  // ------------------------------------------------- Lineage strategy

  test("Lineage.cut: reliable mode checkpoints to the checkpoint dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val sc = spark.sparkContext
    val df = spark.range(0, 10).toDF("id")
    // default: local checkpoint, rows unchanged
    assert(graft.config.Lineage.cut(df).collect().map(_.getLong(0)).sorted
      .sameElements(0L until 10L))
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    try {
      // only assertable while no suite has set a session checkpoint dir
      if (sc.getCheckpointDir.isEmpty)
        intercept[IllegalArgumentException] {
          graft.config.Lineage.cut(df) // no checkpoint dir → loud failure
        }
      sc.setCheckpointDir(dir)
      val out = graft.config.Lineage.cut(df)
      assert(out.collect().map(_.getLong(0)).sorted.sameElements(0L until 10L))
      assert(new java.io.File(dir).listFiles().nonEmpty,
        "reliable mode must write to the checkpoint dir")
    } finally spark.conf.unset("spark.graft.checkpoint.reliable")
  }

  test("connectedComponents converges identically with fused doubling") {
    // long chain — the shape pointer doubling exists for
    val chain = (0L until 20L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("ida", "idb")
    val plain = graft.ext.Dedup.connectedComponents(chain, maxIter = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val doubled = graft.ext.Dedup.connectedComponents(chain, maxIter = 25,
        pointerDoubling = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(plain == doubled)
    assert(doubled.forall(_._2 == 0L))
  }
}
