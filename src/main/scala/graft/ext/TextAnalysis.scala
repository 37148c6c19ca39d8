package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines — all
  * pure Catalyst column expressions (whole-stage codegen'd, no UDFs), and
  * all engineered for exact cross-engine determinism: integer arithmetic or
  * md5 digests, never order-sensitive float accumulation.
  */
object TextAnalysis {
  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** BPE-ish tokenization: word pieces + individual punctuation. */
  def reTokenCount(text: Column): Column =
    regexp_count(text, lit("\\w+|[^\\w\\s]")).cast("long")

  /** k=3 token shingles; empty array when the doc has fewer than 3 tokens. */
  def shingles(toks: Column): Column =
    when(size(toks) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))

  /** Document fingerprint: minimum md5 over the k=3 shingle set (a 1-hash
    * MinHash — winnowing-style representative). Null for docs under 3 tokens.
    */
  def fingerprint(toks: Column): Column = array_min(transform(shingles(toks), sh => md5(sh)))

  /** MinHash signature: `n` independent permutations simulated as
    * min(md5(seed || ':' || shingle)). Deterministic across engines (md5
    * lowercase hex both in Spark and DuckDB).
    */
  def minhashSignature(shingleCol: Column, n: Int = 32): Column =
    transform(sequence(lit(0), lit(n - 1)), i =>
      array_min(transform(shingleCol, sh => md5(concat(i.cast("string"), lit(":"), sh)))))

  /** LSH band buckets over a MinHash signature: `bands` buckets of
    * `rows = n/bands` signature entries each, hashed to one bucket id. */
  def bandBuckets(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",", slice(sig, b * rows + 1, rows))).as("bucket"))): _*)

  /** 16-bit polynomial rolling hash of a token: fold acc*31+ascii mod 2^16.
    * Integer-exact in any engine (the basis for [[simhash16]]). */
  def polyHash16(tok: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(tok)), i => ascii(substr(tok, i, lit(1)))),
      lit(0L),
      (acc, c) => (acc * 31 + c) % 65536)

  /** 16-bit SimHash over the token multiset: per-bit majority vote of token
    * hashes. Near-duplicate docs land at small Hamming distance. */
  def simhash16(toks: Column): Column = {
    val hs = transform(toks, t => polyHash16(t))
    (0 until 16).map { j =>
      val vote = aggregate(hs, lit(0L),
        (acc, h) => acc + (shiftright(h, j) % 2) * 2 - 1)
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Marker-token language id (n-gram heuristic floor): deterministic and
    * cheap; a real model slots into the same column contract. */
  def langId(text: Column): Column = {
    val en = regexp_count(text, lit("\\bthe\\b")) + regexp_count(text, lit("\\band\\b"))
    when(en > 0, lit("en")).otherwise(lit("und"))
  }

  /** Quality stats, all integer or scaled-integer (floor) for exactness:
    * word count, avg word length ×100, stopword ratio ×10000, punctuation
    * ratio ×10000. */
  def qualityCols(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val words = size(toks).cast("long")
    val charsNoWs = length(regexp_replace(text, "\\s+", "")).cast("long")
    val stops = size(filter(toks, t =>
      t.isin("the", "a", "of", "and", "to", "in", "is"))).cast("long")
    val punct = regexp_count(text, lit("[^\\w\\s]")).cast("long")
    Seq(
      words.as("words"),
      (lit(100L) * charsNoWs / words).cast("long").as("avg_wlen_x100"),
      (lit(10000L) * stops / words).cast("long").as("stop_x10000"),
      (lit(10000L) * punct / length(text).cast("long")).cast("long").as("punct_x10000"))
  }
}
