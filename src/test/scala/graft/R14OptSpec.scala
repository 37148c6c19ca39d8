package graft

import graft.ext.TextAnalysis
import graft.streaming.{CmsStream, HllStream}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 optimization parity proofs: every rewrite in this round must
  * be BIT-IDENTICAL to the chain it replaced — these specs pin that on
  * adversarial inputs (unicode, empties, whitespace edge shapes), so the
  * oracle gate can never be the first place a divergence shows up.
  */
class R14OptSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // -------------------------------------------------- md5_prefix_long

  test("md5_prefix_long equals the conv(substring(md5)) chain it replaces") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val vals = Seq("", "a", "hello world", "päivää £→ユニコード",
      "  leading and trailing  ", "\ttabs\nand newlines",
      "0123456789abcdef0123456789abcdef",
      "a slightly longer sentence with several whitespace separated tokens")
    val df = vals.toDF("s")
    val combos = Seq((1, 15), (17, 15), (1, 13), (1, 10), (1, 8))
    combos.foreach { case (st, ln) =>
      val got = df.select(
        call_function("md5_prefix_long", col("s"), lit(st), lit(ln)).as("fast"),
        conv(substring(md5(col("s")), st, ln), 16, 10).cast("long").as("ref"))
        .collect()
      got.foreach { r =>
        assert(r.getLong(0) == r.getLong(1),
          s"md5_prefix_long(start=$st,len=$ln) diverged: " +
            s"${r.getLong(0)} != ${r.getLong(1)}")
      }
    }
  }

  test("md5_prefix_long: null in, null out") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val r = Seq(Option.empty[String]).toDF("s")
      .select(call_function("md5_prefix_long", col("s"), lit(1), lit(13)))
      .collect()
    assert(r.head.isNullAt(0))
  }

  // ------------------------------------- minhash signature fast path

  test("minhashSignatureRows (minhash_sig) equals the explode+agg reference") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "spark engines shuffle partitions across executors tonight"),
      (2L, "two tokens"),          // <3 tokens: NO signature row either way
      (3L, "exactly three tokens"),
      (4L, " leading whitespace then some more tokens follow here"),
      (5L, "the quick brown fox jumps over the lazy dog")) // dup of 0
      .toDF("doc_id", "text")
    val fast = TextAnalysis.minhashSignatureRows(docs, 32)
      .orderBy("doc_id").collect().map(_.toSeq)
    val ref = TextAnalysis.minhashSignatureRowsAgg(docs, 32)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(fast.length == ref.length, "row sets differ (short-doc handling)")
    fast.zip(ref).foreach { case (f, r) => assert(f == r) }
  }

  // ------------------------------------- winnowing pair-input parity

  test("explode(winnow_fps) equals winnowingSelections' distinct (doc_id, h)") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then rests"),
      (2L, "seven tokens only never reach winnow window"), // 7 toks: no fps
      (3L, "a b c a b c a b c a b c a b c"), // repeated grams → repeated hashes
      (4L, "exactly eight whitespace separated tokens right here now"))
      .toDF("doc_id", "text")
    // compare WITH multiplicity (sorted seqs, not sets): winnowingPairs'
    // nh counts and pair-join cardinalities rely on winnow_fps emitting
    // each (doc_id, h) exactly once — a Set compare would mask a future
    // duplicate-emitting regression (r14 advice)
    val fast = docs.select(col("doc_id"),
      explode(call_function("winnow_fps", col("text"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val ref = TextAnalysis.winnowingSelections(docs)
      .select("doc_id", "h").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(fast == ref)
  }

  // -------------------------------- streaming sketch local combines

  test("CMS cell-hit local combine preserves per-cell batch sums") {
    val docs = Seq((1L, "a a b c a b"), (2L, "b c d d"), (3L, "x"))
      .toDF("doc_id", "text")
    val raw = CmsStream.cellHits(docs)
      .groupBy("cell").agg(sum("inc").as("n"))
      .orderBy("cell").collect().map(r => (r.getLong(0), r.getLong(1)))
    // combine path: what cells() feeds the stateful operator, re-summed
    val combined = CmsStream.cellHits(docs)
      .mapPartitions { it =>
        val m = new java.util.HashMap[Long, Long]()
        it.foreach(h => m.merge(h.cell, h.inc, (a, b) => a + b))
        import scala.jdk.CollectionConverters._
        m.entrySet().iterator().asScala
          .map(e => CmsStream.CellHit(e.getKey, e.getValue))
      }(org.apache.spark.sql.Encoders.product[CmsStream.CellHit])
      .groupBy("cell").agg(sum("inc").as("n"))
      .orderBy("cell").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(raw.toSeq == combined.toSeq)
  }

  test("HLL bucket-rank local combine preserves per-bucket batch max") {
    val docs = Seq(
      (1L, "one two three four five six seven"),
      (2L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val raw = HllStream.bucketRanks(docs)
      .groupBy("bucket").agg(max("rank").as("mx"))
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    val combined = HllStream.bucketRanks(docs)
      .mapPartitions { it =>
        val m = new java.util.HashMap[Long, Long]()
        it.foreach(r => m.merge(r.bucket, r.rank, (a, b) => math.max(a, b)))
        import scala.jdk.CollectionConverters._
        m.entrySet().iterator().asScala
          .map(e => HllStream.BucketRank(e.getKey, e.getValue))
      }(org.apache.spark.sql.Encoders.product[HllStream.BucketRank])
      .groupBy("bucket").agg(max("rank").as("mx"))
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(raw.toSeq == combined.toSeq)
  }
}
