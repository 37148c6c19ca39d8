package graft.ext

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training on the FULL corpus — the tokenizer
  * construction step of an LLM data pipeline, built scale-first:
  *
  *   - ONE distributed job builds the weighted distinct-word histogram
  *     (word → count, one map-side-combined token shuffle) — the working
  *     set is |distinct words|, never the token stream;
  *   - the histogram is collected ONCE (bounded by vocabulary size — the
  *     same driver-side bound sentencepiece / HuggingFace trainers accept)
  *     and the merge loop runs on the driver: learning a 32k-merge vocab
  *     is 32k in-memory passes, NOT 32k sequential Spark jobs;
  *   - the learned merges return to the cluster as plan constants: token
  *     counting applies them via the codegen'd
  *     [[graft.functions.BpeApply bpe_apply]] expression over the distinct
  *     vocabulary, then the token stream joins on the word key — the merge
  *     loop runs |vocab| times, not |tokens| times.
  *
  * [[trainDistributed]] keeps the previous one-Spark-job-per-merge round
  * loop as a cross-checking oracle for the driver loop (spec-asserted
  * equal); it is correct but its job count is linear in merges, so it is
  * not the production path.
  *
  * Everything is integer counts and string comparison, so the DuckDB
  * oracle rederives the identical merge table with a recursive CTE.
  *
  * Determinism contract (mirrored by the oracle and the driver loop):
  *   - pair count = Σ word_count over adjacent symbol positions (overlaps
  *     counted: [a,a,a] contributes (a,a) twice);
  *   - winner = max count, ties by (p1, p2) lexicographic min;
  *   - merge application = greedy leftmost fold: scan symbols left to
  *     right, merging a (p1, p2) adjacency as it is encountered — [a,a,a]
  *     becomes [aa, a].
  */
object BpeTrainer {
  /** Greedy-leftmost application of ONE merge to a symbol array — the
    * built-in-functions twin of one [[graft.functions.BpeApply]] pass,
    * kept for cross-checking in tests. */
  def foldMerge(syms: Column, p1: String, p2: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(p1) && x === lit(p2),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(p1 + p2))))
        .otherwise(concat(acc, array(x))))

  /** (w, cnt, syms) — the distinct-word vocabulary with per-character
    * symbol arrays. */
  def charVocab(corpus: DataFrame): DataFrame = {
    // sequence(1, 0) would generate a DESCENDING range — guard the empty
    // token a leading/trailing-whitespace split can produce
    val chars = when(length(col("w")) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))))
    TextAnalysis.tokenRows(corpus)
      .groupBy(col("tok").as("w")).agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"), chars.as("syms"))
  }

  /** The driver-side histogram bound. A 100-TB web corpus has 10⁸–10⁹
    * distinct whitespace "words" — model-sized only after pruning, so the
    * collect is NEVER unbounded: rows below `minCount` are dropped and the
    * rest capped to the top `maxVocabRows` by (count desc, word asc) — a
    * TakeOrdered-shaped job (bounded heap per partition, no global sort),
    * the same frequency-floor/top-N discipline sentencepiece and the HF
    * trainers apply before their in-memory loop. The defaults pass every
    * test-scale corpus through unchanged while keeping the worst-case
    * driver footprint at ~hundreds of MB. */
  val DefaultMinCount = 1L
  val DefaultMaxVocabRows: Int = 4 << 20 // ~4.2M distinct words

  private def collectVocab(corpus: DataFrame, minCount: Long,
      maxVocabRows: Int): (Array[Array[String]], Array[Long]) = {
    val v = charVocab(corpus).filter(col("cnt") >= minCount)
    val capped =
      if (maxVocabRows == Int.MaxValue) v
      else v.orderBy(desc("cnt"), asc("w")).limit(maxVocabRows)
    val hist = capped.select(col("cnt"), col("syms")).collect()
    (hist.map(_.getSeq[String](1).toArray), hist.map(_.getLong(0)))
  }

  /** Learn `merges` merge rules: one distributed histogram job + a
    * driver-side merge loop (the sentencepiece/HF trainer split). Returns
    * (p1, p2, pairCount) in merge order. Wall-time is one Spark job plus
    * O(merges · Σ|word symbols|) driver work — sublinear in merge count
    * where the round-per-job loop was linear in Spark-job latency. The
    * histogram collect is bounded by `minCount`/`maxVocabRows` (see
    * [[DefaultMaxVocabRows]]) — never by raw corpus vocabulary. */
  def train(corpus: DataFrame, merges: Int = 8,
      minCount: Long = DefaultMinCount,
      maxVocabRows: Int = DefaultMaxVocabRows): Seq[(String, String, Long)] = {
    val (words, cnts) = collectVocab(corpus, minCount, maxVocabRows)
    trainLocal(words, cnts, merges)
  }

  /** Vocabulary-size-targeted training — the sentencepiece/HF stopping
    * contract: every merge mints exactly one new token id, so the final
    * vocabulary is |base alphabet| + |merges|; learn until it reaches
    * `vocabSize` (or pairs exhaust first). Same determinism contract,
    * one-histogram-job cost, and collect bound as [[train]]. */
  def trainToVocab(corpus: DataFrame, vocabSize: Int,
      minCount: Long = DefaultMinCount,
      maxVocabRows: Int = DefaultMaxVocabRows): Seq[(String, String, Long)] = {
    val (words, cnts) = collectVocab(corpus, minCount, maxVocabRows)
    val alphabet = words.iterator.flatten.toSet.size
    trainLocal(words, cnts, math.max(0, vocabSize - alphabet))
  }

  /** The driver merge loop over a collected (symbols, count) histogram.
    * Exactly the distributed contract: global recount each round, max-count
    * winner with (p1, p2)-lexicographic tie-break, greedy-leftmost apply. */
  private[ext] def trainLocal(words0: Array[Array[String]], cnts: Array[Long],
      merges: Int): Seq[(String, String, Long)] = {
    val learned = ArrayBuffer.empty[(String, String, Long)]
    var words = words0
    var round = 0
    var exhausted = false
    while (round < merges && !exhausted) {
      val pc = mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < words.length) {
        val s = words(wi)
        val c = cnts(wi)
        var j = 0
        while (j + 1 < s.length) {
          val k = (s(j), s(j + 1))
          pc.update(k, pc.getOrElse(k, 0L) + c)
          j += 1
        }
        wi += 1
      }
      if (pc.isEmpty) exhausted = true
      else {
        var bestK: (String, String) = null
        var bestN = Long.MinValue
        pc.foreach { case (k, n) =>
          val better = n > bestN || (n == bestN && (k._1 < bestK._1 ||
            (k._1 == bestK._1 && k._2 < bestK._2)))
          if (bestK == null || better) { bestK = k; bestN = n }
        }
        learned += ((bestK._1, bestK._2, bestN))
        words = words.map(graft.functions.BpeApply.mergePass(_, bestK._1, bestK._2))
      }
      round += 1
    }
    learned.toSeq
  }

  /** The previous round-per-Spark-job trainer, kept as the distributed
    * cross-check for [[train]] (one full pair-count aggregation + a
    * single-row collect per merge — job count linear in merges, so it
    * cannot run at a production merge count). */
  def trainDistributed(corpus: DataFrame, merges: Int = 8): Seq[(String, String, Long)] = {
    val learned = ArrayBuffer.empty[(String, String, Long)]
    var cur = charVocab(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var i = 0
      var exhausted = false
      while (i < merges && !exhausted) {
        val top = pairCounts(cur)
          .orderBy(desc("n"), asc("p1"), asc("p2")).limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val (p1, p2, n) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          learned += ((p1, p2, n))
          val next = cur
            .select(col("w"), col("cnt"), foldMerge(col("syms"), p1, p2).as("syms"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          next.count() // materialize before dropping the previous round
          cur.unpersist()
          cur = next
        }
        i += 1
      }
      learned.toSeq
    } finally cur.unpersist()
  }

  /** Weighted adjacent-pair counts over a (cnt, syms) vocabulary. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("syms")) > 1)
      .select(col("cnt"), explode(transform(sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("p1"),
          element_at(col("syms"), i + 1).as("p2")))).as("p"))
      .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
      .agg(sum("cnt").as("n"))

  /** The merge table as the foldable literal [[graft.functions.BpeApply]]
    * consumes — merges ride into the plan as a constant, the broadcast-side
    * shape of a trained tokenizer. */
  private def mergesLit(merges: Seq[(String, String, Long)]): Column =
    typedLit(merges.map { case (p1, p2, _) => Seq(p1, p2) })

  /** Ingest-time (streaming-safe) BPE token counting: the ROW-LOCAL twin
    * of [[tokenCounts]] — the codegen'd `bpe_apply` runs inside a per-word
    * lambda, so the count runs in the admitting micro-batch with zero
    * shuffle and zero state (the [[Contamination.flagContaminated]]
    * contract). Counts are identical to [[tokenCounts]]; prefer that
    * vocab-join form for batch, where the merge loop runs |vocab| times
    * instead of |tokens|. */
  def tokensInline(docs: DataFrame,
      merges: Seq[(String, String, Long)]): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val tc = "__graft_bpe_toks"
    val mLit = mergesLit(merges)
    docs.withColumn(tc, TextAnalysis.tokens(col("text")))
      .withColumn("ws_tokens", size(col(tc)).cast("long"))
      .withColumn("bpe_tokens",
        aggregate(col(tc), lit(0L),
          (acc, w) => acc + size(call_function("bpe_apply", w, mLit))))
      .drop(tc)
  }

  /** Per-document BPE token counts under a learned merge table: the
    * codegen'd merge loop runs over the DISTINCT-WORD vocabulary, then the
    * token stream joins it on the word key — |vocab| `bpe_apply`
    * evaluations + one high-cardinality join + one doc reduction, no
    * per-token merging. */
  def tokenCounts(corpus: DataFrame, merges: Seq[(String, String, Long)]): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val vocabSyms = TextAnalysis.tokenRows(corpus)
      .groupBy(col("tok").as("w")).agg(count(lit(1)).as("_f")).drop("_f")
      .select(col("w"),
        size(call_function("bpe_apply", col("w"), mergesLit(merges)))
          .cast("long").as("n_bpe"))
    TextAnalysis.tokenRows(corpus).select(col("doc_id"), col("tok").as("w"))
      .join(vocabSyms, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("ws_tokens"), sum("n_bpe").as("bpe_tokens"))
  }
}
