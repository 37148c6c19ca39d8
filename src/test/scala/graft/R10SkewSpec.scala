package graft

import graft.ext.Dedup
import graft.queries.Synth
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE/cap evidence on the dedup candidate join under FORCED bucket skew
  * (r9 verdict #7): one templated near-dup family at ~20% of the corpus —
  * the web-boilerplate shape that defeats the exact pre-collapse (each
  * variant differs by one token, so no two are byte-identical) and lands
  * the whole family in the same (band, bucket) keys. The two defenses are
  * shown on the same corpus:
  *
  *   1. `maxBucket` cap — the production switch: hot buckets drop with
  *      observed-metric receipts (dropped_doc_slots / dropped_buckets),
  *      organic pairs survive, capped output ⊆ uncapped output.
  *   2. AQE skew-split — when the cap is OFF, the (band,bucket) self-join
  *      is a sort-merge join whose hot partition AQE splits at runtime
  *      (`skew=true` in the finalized plan), bounding per-task volume even
  *      when exactness (no cap) is required.
  */
class R10SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Organic sf0.001 docs (500) + a 125-member templated family (~20% of
    * the union): 200 shared body tokens + one distinguishing token each, so
    * pairwise Jaccard ≈ 200/202 ≫ the 0.5 threshold and every variant
    * shares most minhash band buckets with every other (per-pair ≥1-band
    * collision probability ≈ 0.99996 at n=32, bands=4). */
  private def skewedCorpus = {
    val body = (1 to 200).map(i => s"boiler$i").mkString(" ")
    val hot = spark.range(125).select(
      (col("id") + 600000L).as("doc_id"),
      concat(lit(body + " variant"), col("id").cast("string")).as("text"))
    // two byte-identical plants (the pre-collapse path's witnesses — the
    // sf0.001 organic corpus has no exact dups)
    val identical = Seq(
      (700000L, "an exactly repeated document body here"),
      (700001L, "an exactly repeated document body here"))
      .toDF("doc_id", "text")
    Synth.documents(spark, sf).select("doc_id", "text")
      .unionAll(hot).unionAll(identical)
  }

  test("maxBucket cap: hot templated buckets drop with metric receipts; " +
    "organic pairs survive; capped subset of uncapped") {
    val corpus = skewedCorpus
    val uncapped = Dedup.minhashLshPairs(corpus)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    val cappedDf = Dedup.minhashLshPairs(corpus, maxBucket = 16)
    // collect THIS DataFrame (not a derived projection): the observed
    // metrics live on the executed QueryExecution
    val capped = cappedDf.collect()
      .map(r => (r.getLong(r.fieldIndex("ida")), r.getLong(r.fieldIndex("idb"))))
      .toSet
    val obs = cappedDf.queryExecution.observedMetrics
    assert(obs.contains("minhash_lsh_bucket_cap"),
      s"cap metric absent; observed = ${obs.keySet}")
    val row = obs("minhash_lsh_bucket_cap")
    val slots = row.getLong(row.fieldIndex("dropped_doc_slots"))
    val bkts = row.getDouble(row.fieldIndex("dropped_buckets"))
    assert(slots > 0, "cap engaged but dropped no doc slots")
    assert(bkts >= 1.0, s"expected >=1 dropped bucket, got $bkts")

    // the hot family dominates the uncapped pair set (125·124/2 = 7750
    // family pairs, minus LSH's tiny per-pair miss rate); the cap must
    // remove hot-family pairs, never invent any
    def hotPairs(s: Set[(Long, Long)]) =
      s.count { case (a, b) => a >= 600000L && b >= 600000L }
    assert(hotPairs(uncapped) >= 7700,
      s"templated family not found uncapped: ${hotPairs(uncapped)}/7750")
    assert(hotPairs(capped) < hotPairs(uncapped),
      "cap did not reduce the hot family's candidate volume")
    assert(capped.subsetOf(uncapped), "cap may only DROP pairs, never invent")
    // byte-identical duplicates travel the pre-collapse path, which the
    // bucket cap cannot touch — the documented cap-immune invariant
    assert(capped.contains((700000L, 700001L)),
      "byte-identical pair must survive the cap (pre-collapse path)")
  }

  test("AQE skew-split: with the cap OFF, the (band,bucket) candidate " +
    "self-join's hot partition is split at runtime (skew=true)") {
    // thresholds scaled to the test corpus; production defaults (256 MB)
    // do the same job at real volume
    withConf(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "128B",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64B",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // the downstream distinct reuses the join's partitioning; let AQE
      // trade that exchange reuse for skew parallelism
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      // keep the candidate join a sort-merge join (broadcast would hide
      // the skew path at this toy scale)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = Dedup.minhashLshPairs(skewedCorpus)
      df.collect() // execute THIS plan so AQE finalizes it
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to split the hot bucket, got:\n" +
          plan.linesIterator.take(60).mkString("\n"))
    }
  }
}
