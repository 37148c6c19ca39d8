package graft.ext

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training on the FULL corpus — the tokenizer
  * construction step of an LLM data pipeline, built scale-first:
  *
  *   - the working set is the distinct-WORD vocabulary (word → count, one
  *     map-side-combined token shuffle), never the token stream — merges
  *     apply to |vocab| rows regardless of corpus size;
  *   - each merge round is one distributed pair-count aggregation
  *     (explode adjacent symbol pairs weighted by word count → groupBy —
  *     high-cardinality, map-side combined) and collects exactly ONE row
  *     (the winning pair): driver state is O(merges), like
  *     [[PqTrainer]]/[[PcaTrainer]];
  *   - token counting joins the token stream against the merged vocabulary
  *     on the word key — the merge fold runs |vocab| times, not |tokens|.
  *
  * Everything is integer counts and string comparison, so the DuckDB
  * oracle rederives the identical merge table with a recursive CTE.
  *
  * Determinism contract (mirrored by the oracle):
  *   - pair count = Σ word_count over adjacent symbol positions (overlaps
  *     counted: [a,a,a] contributes (a,a) twice);
  *   - winner = max count, ties by (p1, p2) lexicographic min;
  *   - merge application = greedy leftmost fold: scan symbols left to
  *     right, merging a (p1, p2) adjacency as it is encountered — [a,a,a]
  *     becomes [aa, a].
  */
object BpeTrainer {
  /** Greedy-leftmost application of ONE merge to a symbol array. */
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

  /** Learn `merges` merge rules. Returns (p1, p2, pairCount) in merge
    * order. Each round: one pair-count aggregation over the vocabulary +
    * a single-row collect; the vocabulary advances through a persisted
    * projection so round j does not recompute rounds 0..j-1. */
  def train(corpus: DataFrame, merges: Int = 8): Seq[(String, String, Long)] = {
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

  /** Ingest-time (streaming-safe) BPE token counting: the ROW-LOCAL twin
    * of [[tokenCounts]] — the merge folds nest inside a per-word lambda,
    * so the count runs in the admitting micro-batch with zero shuffle and
    * zero state (the [[Contamination.flagContaminated]] contract). Counts
    * are identical to [[tokenCounts]]; prefer that vocab-join form for
    * batch, where the folds run |vocab| times instead of |tokens|. Each
    * nested fold's input is the enclosing lambda's variable or an
    * aggregate argument (evaluated once), never a captured attribute
    * subtree — the PLANS.md r4 HOF rule. */
  def tokensInline(docs: DataFrame,
      merges: Seq[(String, String, Long)]): DataFrame = {
    val tc = "__graft_bpe_toks"
    def wordSyms(w: Column): Column = {
      val chars = when(length(w) === 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))))
      merges.foldLeft(chars) { case (c, (p1, p2, _)) => foldMerge(c, p1, p2) }
    }
    docs.withColumn(tc, TextAnalysis.tokens(col("text")))
      .withColumn("ws_tokens", size(col(tc)).cast("long"))
      .withColumn("bpe_tokens",
        aggregate(col(tc), lit(0L), (acc, w) => acc + size(wordSyms(w))))
      .drop(tc)
  }

  /** Per-document BPE token counts under a learned merge table: the fold
    * chain runs over the DISTINCT-WORD vocabulary, then the token stream
    * joins it on the word key — |vocab| fold evaluations + one
    * high-cardinality join + one doc reduction, no per-token merging. */
  def tokenCounts(corpus: DataFrame, merges: Seq[(String, String, Long)]): DataFrame = {
    val vocabSyms = merges.foldLeft(charVocab(corpus).select("w", "syms")) {
      case (df, (p1, p2, _)) =>
        df.select(col("w"), foldMerge(col("syms"), p1, p2).as("syms"))
    }.select(col("w"), size(col("syms")).cast("long").as("n_bpe"))
    TextAnalysis.tokenRows(corpus).select(col("doc_id"), col("tok").as("w"))
      .join(vocabSyms, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("ws_tokens"), sum("n_bpe").as("bpe_tokens"))
  }
}
