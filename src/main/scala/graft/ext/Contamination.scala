package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data operation that removes (or
  * flags) corpus documents sharing verbatim n-grams with an evaluation set,
  * so benchmark answers don't leak into training. The standard production
  * recipe (GPT-3/PaLM-style) is exact n-gram collision at n≈8-13; this is
  * the n=8 exact-collision form.
  *
  * Scale shape: both sides explode ONCE into hashed n-gram rows (narrow
  * lead-window per doc, one md5 per gram); the probe side (the benchmark —
  * always tiny next to a 100 TB corpus) is distinct-ed and broadcast, so
  * the collision check is a broadcast semi-join on the corpus gram stream —
  * no corpus shuffle at all until the per-doc hit count, which groups on
  * doc_id (the same partitioning the gram window already produced: ONE
  * shuffle total).
  */
object Contamination {
  /** (doc_id, gram) rows of `n`-token windows, built NARROWLY: the per-row
    * [[ngramsInline]] array is exploded in place — no token-stream shuffle
    * at all (a doc_id-window formulation would shuffle every (doc, pos,
    * tok) row, the largest intermediate in the pipeline, just to rebuild
    * per-row adjacency the row already has). Tokens materialize as an
    * ATTRIBUTE first: the gram lambda captures `toks`, and a captured
    * non-attribute subtree re-evaluates per element in interpreted HOF
    * eval — the split would otherwise re-run O(grams × n) times per row
    * (see the PLANS.md r4 shingle note). */
  def ngramRows(corpus: DataFrame, n: Int): DataFrame =
    corpus.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(ngramsInline(col("toks"), n)).as("gram"))

  /** Row-local n-gram array (the [[TextAnalysis.shingles]] pattern
    * generalized): for STREAMING/ingest use where the window-based
    * [[ngramRows]] is unavailable. Docs under `n` tokens → empty. */
  def ngramsInline(toks: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))

  /** Distinct md5'd probe grams — bounded by the benchmark size (always
    * tiny next to the corpus), collected once at pipeline build to become
    * the broadcast literal for [[flagContaminated]]. */
  def probeGramHashes(probes: DataFrame, n: Int = 8): Seq[String] =
    ngramRows(probes, n).select(md5(col("gram")).as("gh")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted

  /** The probe set rides into the plan as a LITERAL (serialized with every
    * task binary), which is the right shape only while the benchmark stays
    * benchmark-sized; past this bound callers must pre-hash to a broadcast
    * join ([[contaminatedDocs]]) instead of the inline flag. */
  val MaxProbeLiteral: Int = 100000

  /** Ingest-time decontamination: a pure row-local projection adding a
    * `contaminated` flag — streaming-append-safe (no window, no shuffle,
    * no state), so the check runs in the same micro-batch that admits the
    * document. Same collision semantics as [[contaminatedDocs]]. Fails
    * loudly past [[MaxProbeLiteral]] grams rather than silently bloating
    * every serialized task. */
  def flagContaminated(docs: DataFrame, probeHashes: Seq[String], n: Int = 8,
      maxProbeLiteral: Int = MaxProbeLiteral): DataFrame = {
    require(probeHashes.size <= maxProbeLiteral,
      s"probe set of ${probeHashes.size} grams exceeds the plan-literal bound " +
        s"($maxProbeLiteral): use Contamination.contaminatedDocs (broadcast " +
        "join) for benchmark sets this large")
    // reserved temp name so a caller's own columns survive untouched; the
    // attribute hop keeps the split out of the gram lambda (see ngramRows)
    val tmp = "__graft_decontam_toks"
    docs.withColumn(tmp, TextAnalysis.tokens(col("text")))
      .withColumn("contaminated",
        arrays_overlap(
          transform(ngramsInline(col(tmp), n), g => md5(g)),
          typedLit(probeHashes)))
      .drop(tmp)
  }

  /** Corpus documents colliding with the probe (benchmark) set on at least
    * one `n`-gram: (doc_id, hits = distinct shared grams). Probe docs are
    * excluded from the output (they trivially self-collide). */
  def contaminatedDocs(corpus: DataFrame, probes: DataFrame, n: Int = 8): DataFrame = {
    val grams = ngramRows(corpus, n).select(col("doc_id"), md5(col("gram")).as("gh"))
    val probeGrams = broadcast(
      ngramRows(probes, n).select(md5(col("gram")).as("gh")).distinct())
    val probeIds = probes.select(col("doc_id"))
    grams
      .join(probeGrams, "gh")
      .join(probeIds, Seq("doc_id"), "left_anti")
      .groupBy("doc_id")
      .agg(countDistinct(col("gh")).as("hits"))
  }
}
