package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR, materializing results through the noop sink (a bare
  * count() would let Catalyst prune the projections under test). Prints ONE
  * JSON line — the driver's BENCH_r{N}.json contract.
  *
  * Per-query times on this shared host jitter ±2-4× (cold codegen, GC), so
  * each query is run `SPARK_GRAFT_BENCH_RUNS` times (default 2) and COLD is
  * separated from WARM: `queries` / the `total` carry the MINIMUM of the
  * clean WARM runs (2..N — steady-state plan cost, comparable across
  * rounds), `queries_cold` / `total_cold` the first run (codegen + JIT
  * included), so a cold-JVM tail can never masquerade as a plan regression
  * again. The
  * cache is cleared between runs so a query that persists intermediate
  * state pays its real cost every time. A query that throws is reported as
  * -1 with its name in the `errors` list — a failure must never improve
  * the total.
  *
  * Cross-key interference defense (r9: four keys read 4.7-14× their
  * isolated times inside the 318-key single-JVM run — GC/cache pressure
  * from EARLIER keys, not plan changes; the judge had to re-time them by
  * hand). Layers, each aimed at a measured variance mode:
  *  1. Between keys: clearCache + unpersist every still-persisted RDD +
  *     System.gc(), so a composite that leaked cached state can't tax its
  *     successors. (Removed the r9 14× excursion mode — measured by two
  *     back-to-back full sittings, PLANS.md round-10.)
  *  2. Reported warm = MIN over all clean warm attempts: on a warm
  *     in-memory run, noise (GC pause, scheduler preemption) is strictly
  *     additive, so the minimum is the steady-state plan cost. Keys whose
  *     fastest warm is under [[CheapKeyExtraRunSecs]] (5 s) get one extra
  *     attempt (min-of-2) — sub-second keys otherwise jitter past 1.5× on
  *     ~200 ms of absolute noise. The artifact records the estimator as
  *     "warm_stat":"min" (it was the median through round 9 — per-key
  *     comparisons that straddle the switch would otherwise read the
  *     systematically-lower min as a spurious speedup).
  *  3. Trailing-round reference: the committed BENCH_full.json (env
  *     SPARK_GRAFT_BENCH_REF; used ONLY when its "sf" matches this run's)
  *     supplies each key's prior warm. A warm min above
  *     max(1.2×ref, ref+0.15 s) triggers scrub + isolated redo, up to
  *     SPARK_GRAFT_BENCH_RETRIES (default 2) — this catches the
  *     persistent-window mode where a key is inflated across ALL its
  *     in-run attempts (the key's own minimum can't see it). A REAL
  *     regression reproduces in the isolated redo and is reported high:
  *     the reference removes interference, never code cost. Keys without
  *     a usable ref keep the 3×-own-fastest fallback trigger.
  *     Retried keys are listed in `retried` (full file) / counted in
  *     `n_retried` (stdout) so the artifact records its own corrections.
  */
object Bench {

  /** Defense-2 trigger: keys whose fastest warm is under this many seconds
    * get one extra warm attempt (min-of-2) to kill sub-second jitter. */
  private val CheapKeyExtraRunSecs = 5.0

  /** The distinct query keys BASELINE.md carries timings for — the set the
    * judge compares per-key. The stdout JSON line's `queries` map is
    * restricted to these so the WHOLE line fits in the driver's 2000-char
    * stdout tail capture (r6 lost the head of a 13 KB line and the round's
    * bench parsed as null); every key's warm+cold time still lands in the
    * committed full file. */
  private val BaselineKeys: Set[String] = Set(
    "ann_brute_force", "ann_ivf", "ann_ivf_pq", "ann_ivf_pq_residual",
    "ann_lsh", "ann_pq", "ann_pq_trained", "corpus_decontaminate",
    "corpus_pipeline_e2e", "corpus_stratified_sample",
    "dedup_cluster_components", "dedup_embedding_cosine", "dedup_exact",
    "dedup_keep_canonical", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash", "emb_random_projection", "enrich_builtin_vars",
    "field_select", "flush_size_threshold", "flush_time_interval",
    "match_jmespath", "match_regex_capture", "merge_json", "metrics_counts",
    "multimodal_meta", "parse_error_filter", "parse_syslog_3164",
    "parse_syslog_5424", "q1_agg", "q3_join_broadcast", "q5_multi_join",
    "q_asof_join", "q_cube", "q_distinct_agg", "q_grouping_sets",
    "q_outer_join", "q_range_join_binned", "q_rollup", "q_semi_anti",
    "q_setops", "q_skew_join_salted", "q_topk", "q_window",
    "replace_template", "route_first_match", "route_topic_dynamic",
    "scalar_surface", "schema_declared_project", "schema_infer_json",
    "sessionize_events", "sink_group_by_destination", "sink_kafka_shape",
    "src_file_test_mode", "src_lines", "stop_drop", "text_fingerprint",
    "text_langid", "text_quality", "text_tokens", "variant_json")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // 2 runs (cold + 1 warm) by default: at 224 keys a third run would put
    // the whole bench past the driver's patience for marginal jitter gain
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query isn't paying JIT cost
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    // optional comma-separated key filter — the sf1 scaling runs time only
    // the heavy subset instead of all 260 keys
    val keyFilter = sys.env.get("SPARK_GRAFT_KEYS")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val retries = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "2").toInt
    // Trailing-round per-key reference (defense 3 in the scaladoc): the
    // committed previous full-run artifact, same sf only. The file is
    // Bench's own output, so the parse is a narrow scan of the shape it
    // writes — {"queries":{"k":1.234,...}} with "sf" at top level.
    val refTimes: Map[String, Double] = {
      val path = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", "BENCH_full.json")
      try {
        val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
        val sfOk = """"sf"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(txt)
          .exists(_.group(1) == sfDir)
        if (!sfOk) Map.empty
        else """"queries"\s*:\s*\{([^}]*)\}""".r.findFirstMatchIn(txt)
          .map(_.group(1)).toSeq
          .flatMap(body => """"([^"]+)"\s*:\s*(-?[0-9.]+)""".r
            .findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble))
          .toMap.filter(_._2 > 0)
      } catch { case _: Throwable => Map.empty }
    }
    if (refTimes.nonEmpty) System.err.println(
      s"[bench] trailing reference loaded: ${refTimes.size} keys (same sf)")
    def fmt0(d: Double): String = java.lang.String.format(
      java.util.Locale.ROOT, "%.2f", java.lang.Double.valueOf(d))
    var errors = List.empty[String]
    var retriedKeys = List.empty[String]
    // scrub shared executor state so key N's leaked cache/persist pressure
    // can't inflate key N+1's time (r9's 14× in-bench excursions)
    def scrub(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => keyFilter.forall(_.contains(name)) }
      .map { case (name, fn) =>
      def timeOnce(): Option[Double] = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None
        }
      }
      scrub()
      val times = (1 to runs).flatMap(_ => timeOnce())
      val (cold, warmMin, note) =
        if (times.size < runs) { errors ::= name; (-1.0, -1.0, "") }
        else {
          val warm = scala.collection.mutable.ArrayBuffer[Double](
            (if (times.size > 1) times.tail else times): _*)
          // cheap-key stabilization: one extra attempt (defense 2)
          if (warm.min < CheapKeyExtraRunSecs) timeOnce().foreach(warm += _)
          // suspicion threshold: trailing ref if usable, else own-fastest.
          // 1.2x (not 1.5x): the back-to-back criterion is 1.5x BETWEEN
          // runs, so each run must sit within ~sqrt(1.5) of the common
          // reference — at 1.5x two sittings can straddle the bound
          // (measured: 93.1% at the looser threshold, PLANS.md).
          val threshold = refTimes.get(name)
            .map(r => math.max(1.2 * r, r + 0.15))
            .getOrElse(3 * times.min)
          var redos = 0
          val before = warm.min
          while (warm.min > threshold && redos < retries) {
            scrub()
            Thread.sleep(200)
            timeOnce().foreach(warm += _)
            redos += 1
          }
          val n = if (redos > 0) {
            retriedKeys ::= name
            s"  RETRIED x$redos (${fmt0(before)} -> ${fmt0(warm.min)})"
          } else ""
          (times.head, warm.min, n)
        }
      System.err.println(
        f"[bench] $name%-28s cold $cold%8.2f s  warm $warmMin%8.2f s  (runs: ${
          times.map(t => f"$t%.2f").mkString(", ")})$note")
      (name, cold, warmMin)
    }
    val total = results.collect { case (_, _, w) if w >= 0 => w }.sum
    val totalCold = results.collect { case (_, c, _) if c >= 0 => c }.sum
    // Full per-key detail (every key, warm + cold, 3 dp) goes to a FILE —
    // the committed record; stdout carries only what must survive the
    // driver's 2000-char tail capture.
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath),
      renderFullJson(results, errors, retriedKeys, sfDir))
    // drift alarm: a renamed/removed key must not silently vanish from the
    // per-key map the judge compares — count what the filter dropped.
    // Scoped to the env key filter: an SPARK_GRAFT_KEYS subset run is not
    // baseline drift.
    val missingBase = BaselineKeys
      .filter(k => keyFilter.forall(_.contains(k)))
      .diff(results.map(_._1).toSet)
    if (missingBase.nonEmpty) System.err.println(
      s"[bench] WARNING: ${missingBase.size} BASELINE.md keys absent from " +
        s"SparkEntry.queries: ${missingBase.toSeq.sorted.mkString(", ")}")
    // Stop the session BEFORE the contract line so the one-line JSON is
    // the LAST thing on stdout (r14 verdict: PERF ingest found neither
    // bench even though both files carried the line mid-tail — any
    // shutdown chatter after the line risks pushing it out of the
    // driver's tail window). BenchContractSpec pins the line shape.
    spark.stop()
    // ONE compact stdout line (≈1.7 KB): totals + the BASELINE.md keys the
    // judge compares per-key. Must stay < ~1.9 KB end-to-end or the driver's
    // tail window decapitates it and the round loses its bench.
    println(renderStdoutLine(results, errors, retriedKeys.size,
      missingBase.size, fullPath, sfDir))
    System.out.flush()
  }

  private def fmt(d: Double, dp: Int): String = java.lang.String.format(
    java.util.Locale.ROOT, s"%.${dp}f", java.lang.Double.valueOf(d))
  private def obj(rs: Seq[(String, Double, Double)], dp: Int)(
      sel: ((String, Double, Double)) => Double) = rs
    .map { case t @ (k, _, _) => "\"" + k + "\":" + fmt(sel(t), dp) }
    .mkString("{", ",", "}")
  private def errJson(errors: Seq[String]): String =
    errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")

  /** The committed full-file record: every key, warm + cold, 3 dp.
    * Format pinned by BenchContractSpec — the driver and the round
    * reports both parse it. */
  private[graft] def renderFullJson(results: Seq[(String, Double, Double)],
      errors: Seq[String], retried: Seq[String], sfDir: String): String = {
    val total = results.collect { case (_, _, w) if w >= 0 => w }.sum
    val totalCold = results.collect { case (_, c, _) if c >= 0 => c }.sum
    s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec",""" +
      s""""warm_stat":"min",""" +
      s""""total_cold":${fmt(totalCold, 3)},"queries":${obj(results, 3)(_._3)},""" +
      s""""queries_cold":${obj(results, 3)(_._2)},"errors":${errJson(errors)},""" +
      s""""retried":${retried.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""sf":"$sfDir"}"""
  }

  /** The driver-contract stdout line: ONE line of JSON, `"metric":"total"`
    * first, totals + the BASELINE.md per-key map. Format pinned by
    * BenchContractSpec (single line, leading token, sub-1.9 KB at the
    * full key surface). */
  private[graft] def renderStdoutLine(results: Seq[(String, Double, Double)],
      errors: Seq[String], nRetried: Int, nMissingBase: Int,
      fullPath: String, sfDir: String): String = {
    val total = results.collect { case (_, _, w) if w >= 0 => w }.sum
    val totalCold = results.collect { case (_, c, _) if c >= 0 => c }.sum
    val baseRs = results.filter(t => BaselineKeys.contains(t._1))
    s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec",""" +
      s""""total_cold":${fmt(totalCold, 2)},"n_keys":${results.size},""" +
      s""""baseline_keys_missing":$nMissingBase,""" +
      s""""n_retried":$nRetried,""" +
      s""""errors":${errJson(errors)},"full":"$fullPath",""" +
      s""""queries":${obj(baseRs, 2)(_._3)},"sf":"$sfDir"}"""
  }
}
