package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 second wave: span REMOVAL (the destructive half of exact
  * substring dedup), verified on planted corpora where every removed token
  * is hand-checkable.
  */
class R9bPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toks(n: Int, p: String = "w"): String =
    (0 until n).map(i => s"$p$i").mkString(" ")

  private def md5Of(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("spanClean: exact copy loses everything, original keeps everything") {
    // 20 tokens → spans at 0,4,8,12 (window 8); the copy's spans are all
    // non-first ⇒ islands [0,11],[4,15],[8,19] merge to [0,19] — full wipe
    val corpus = Seq((1L, toks(20)), (2L, toks(20))).toDF("doc_id", "text")
    val r = graft.ext.Dedup.spanClean(corpus).orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(r === Seq(
      (1L, 20L, 0L, 0L, md5Of(toks(20))),
      (2L, 20L, 20L, 1L, md5Of(""))))
  }

  test("spanClean removes WITHIN-doc repetition, keep-first") {
    // 8 unique tokens, repeated, then a distinct 8-token tail: the second
    // block's aligned span (start 8) duplicates start-0's hash → island
    // [8,15] removed; straddling spans (4,12) are unique and survive
    val text = toks(8, "a") + " " + toks(8, "a") + " " + toks(8, "z")
    val corpus = Seq((7L, text)).toDF("doc_id", "text")
    val r = graft.ext.Dedup.spanClean(corpus)
      .as[(Long, Long, Long, Long, String)].collect().head
    assert(r === ((7L, 24L, 8L, 1L, md5Of(toks(8, "a") + " " + toks(8, "z")))))
  }

  test("spanClean: two separated duplicate regions form two islands") {
    // doc 1 = A(8) ++ M(12) ++ B(8): A and B replanted in docs 2,3 at
    // aligned starts (their own start-0 spans) — doc 1 is first by doc_id
    // so keeps all; docs 2,3 lose their 8-token copies
    val a = toks(8, "a"); val b = toks(8, "b")
    val corpus = Seq(
      (1L, a + " " + toks(12, "m") + " " + b),
      (2L, a + " " + toks(8, "x")),
      (3L, b + " " + toks(8, "y"))).toDF("doc_id", "text")
    val r = graft.ext.Dedup.spanClean(corpus).orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(r.head === ((1L, 28L, 0L, 0L, md5Of(a + " " + toks(12, "m") + " " + b))))
    assert(r(1) === ((2L, 16L, 8L, 1L, md5Of(toks(8, "x")))))
    assert(r(2) === ((3L, 16L, 8L, 1L, md5Of(toks(8, "y")))))
  }

  test("ppsSample: exactly k hits, each doc within its systematic bracket") {
    val docs = graft.queries.Synth.documents(spark, "/root/testdata/sf0.001")
    val k = 100L
    val r = graft.ext.Selection.ppsSample(docs, k)
      .as[(Long, Long, Long)].collect()
    assert(r.map(_._3).sum === k, "systematic PPS draws EXACTLY k")
    val w = docs.agg(sum("n_chars")).head().getLong(0)
    r.foreach { case (id, wi, hits) =>
      val lo = wi * k / w
      assert(hits == lo || hits == lo + 1,
        s"doc $id: hits=$hits outside {⌊wk/W⌋, ⌈wk/W⌉} = {$lo, ${lo + 1}}")
    }
    // determinism: the draw is a pure function of the corpus
    val r2 = graft.ext.Selection.ppsSample(docs, k)
      .as[(Long, Long, Long)].collect()
    assert(r.toSet === r2.toSet)
  }

  test("ppsSample: a dominant-weight doc collects its proportional multi-hits") {
    // planted: one doc at ~90% of the weight mass with k=10 must be hit
    // 9 or 10 times; light docs at most once
    val docs = ((1L to 10L).map(i => (i, s"light doc $i", 1L)) :+
      ((99L, "x " * 100, 90L))).toDF("doc_id", "text", "n_chars")
    val r = graft.ext.Selection.ppsSample(docs, 10L)
      .as[(Long, Long, Long)].collect()
    assert(r.map(_._3).sum === 10L)
    val heavy = r.find(_._1 == 99L).map(_._3).getOrElse(0L)
    assert(heavy === 9L || heavy === 10L, s"heavy doc drew $heavy")
    assert(r.filter(_._1 != 99L).forall(_._3 == 1L))
  }

  test("bootstrapCi: CI brackets the point estimate; Poisson mass is sane") {
    val t = graft.ext.Selection.PoissonThresholds
    assert(t === t.sorted && t.last > (0.999995 * math.pow(2, 60)).toLong,
      "thresholds monotone, j=8 CDF ~ 1")
    val docs = graft.queries.Synth.documents(spark, "/root/testdata/sf0.001")
    val r = graft.ext.Selection.bootstrapCi(docs)
      .as[(Long, Long, Long, Long)].collect().head
    val (mean, lo, hi, n) = r
    assert(n === 200L && lo <= mean && mean <= hi && lo < hi,
      s"degenerate CI: $r")
    // the 95% band of a 500-doc mean should be tight (≪ ±10% of the mean)
    assert(hi - lo < mean / 5, s"implausibly wide CI: $r")
  }

  test("readability: hand-computed integer Flesch on a planted doc") {
    // words=5, sentence runs = {".", "!"} = 2, vowel groups: the/cat/sat/it/ran
    // = 5.  score = 206835 - (1015*((1000*5) div 2)) div 1000
    //             - (84600*((1000*5) div 5)) div 1000 = 206835 - 2537 - 84600
    val docs = Seq((1L, "the cat sat. it ran!"),
      (2L, "no sentence punctuation at all")).toDF("doc_id", "text")
    val r = graft.ext.TextAnalysis.readability(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r.head === ((1L, 5L, 2L, 5L, 206835L - 2537L - 84600L)))
    // sentences floored at 1; vowel groups: o,e,e,e,u,ua,io,a,a = 9
    assert(r(1)._3 === 1L && r(1)._2 === 5L && r(1)._4 === 9L)
  }

  test("spanClean: sub-window docs pass through untouched") {
    val corpus = Seq((1L, "only five short tokens here"),
      (2L, "only five short tokens here")).toDF("doc_id", "text")
    val r = graft.ext.Dedup.spanClean(corpus).orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(r.forall(t => t._3 == 0L && t._5 == md5Of("only five short tokens here")))
  }
}
