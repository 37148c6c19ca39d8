package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 continuation wave: prefix-filter exact-Jaccard join (complete vs
  * brute force), content-defined chunking (insertion robustness), BM25. */
class R9PlanSpec extends AnyFunSuite {
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

  test("prefix-filter join is COMPLETE: output == brute-force Jaccard >= 0.6") {
    import graft.ext.{Dedup, TextAnalysis}
    val docs = graft.queries.Synth.documents(spark, sf).select("doc_id", "text")
    val got = Dedup.prefixFilterPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force is test-only ground truth: 500 docs = 125k pairs
    val ss = docs.select(col("doc_id"),
      array_distinct(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 5)).as("s"))
    val want = ss.as("x").crossJoin(ss.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"),
        size(array_intersect(col("x.s"), col("y.s"))).cast("long").as("inter"),
        (size(col("x.s")).cast("long") + size(col("y.s"))).as("ssum"))
      .select(col("ida"), col("idb"), col("inter"), (col("ssum") - col("inter")).as("uni"))
      .filter(lit(10L) * col("inter") >= lit(6L) * col("uni"))
      .select(col("ida"), col("idb"),
        (lit(10000L) * col("inter") / col("uni")).cast("long").as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "test corpus must contain Jaccard>=0.6 pairs")
    assert(got == want,
      s"prefix filter must be exact: missing=${(want -- got).take(5)} " +
        s"extra=${(got -- want).take(5)}")
  }

  test("dedup_jaccard_prefix plan: keyed joins only — no product, no window") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      // pin the REAL pipeline, pre-checkpoint (the key's executed plan is
      // the checkpointed-RDD scan)
      val docs = graft.queries.Synth.documents(spark, sf).select("doc_id", "text")
      val p = graft.ext.Dedup
        .prefixPairsFromSets(graft.ext.Dedup.shingleSets(docs), 6L, 10L)
        .queryExecution.executedPlan
      assert(p.collect { case c: CartesianProductExec => c }.isEmpty, s"$p")
      assert(p.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty, s"$p")
      assert(p.collect { case w: WindowExec => w }.isEmpty,
        s"the rarity order must come from row-local struct sort, not a " +
          s"vocabulary window:\n$p")
    }
  }

  test("CDC chunking: boundaries re-synchronize after a head insertion") {
    import spark.implicits._
    import graft.ext.Dedup
    // 120 deterministic pseudo-random tokens; doc 1 prepends one token
    val toks = (0 until 120).map(i => s"w${(i * 2654435761L) % 97}")
    val base = toks.mkString(" ")
    val shifted = "zzz " + base
    val out = Dedup.cdcChunkStats(
        Seq((0L, base), (1L, shifted)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (n0, d0) = out(0L)
    val (n1, d1) = out(1L)
    assert(n0 >= 3, s"expected several chunks from 120 tokens, got $n0")
    // every chunk after the first boundary is byte-identical across the
    // two docs — only the head chunk can differ (THE content-defined
    // property; a fixed-stride chunker would shift every chunk)
    assert(d0 >= n0 - 1, s"doc0: $d0 of $n0 chunks shared after insertion")
    assert(d1 >= n1 - 1, s"doc1: $d1 of $n1 chunks shared after insertion")
    // and an exact copy is fully duplicated
    val dup = Dedup.cdcChunkStats(
        Seq((0L, base), (1L, base)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(dup.values.forall(_ == 10000L), s"exact copies must be 10000: $dup")
  }

  test("CDC chunks reassemble the document exactly") {
    // chunk texts joined back with single spaces == the tokenized doc —
    // no token lost or duplicated at any boundary (checked on real docs)
    val docs = graft.queries.Synth.documents(spark, sf)
      .select("doc_id", "text").limit(50)
    val chunked = graft.ext.Dedup.cdcChunkArrays(docs)
      .join(docs, "doc_id")
      .select(col("doc_id"),
        concat_ws(" ", col("chunk")).as("joined"),
        concat_ws(" ", graft.ext.TextAnalysis.tokens(col("text"))).as("orig"))
      .filter(col("joined") =!= col("orig"))
    assert(chunked.count() == 0, "chunking must partition the token stream")
  }

  test("cdc_chunks expression == the built-in transform/filter/zip_with chain") {
    // the slow expression chain the codegen'd CdcChunks replaced stays as
    // the cross-check reference: identical chunk arrays on real docs
    val docs = graft.queries.Synth.documents(spark, sf)
      .select("doc_id", "text").limit(50)
    val chain = docs
      .select(col("doc_id"), graft.ext.TextAnalysis.tokens(col("text")).as("t"))
      .withColumn("g", expr(
        "transform(t, w -> CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT) % 16)"))
      .withColumn("bpos", expr(
        """CASE WHEN size(t) < 4 THEN CAST(array() AS array<bigint>)
          |ELSE filter(sequence(4L, CAST(size(t) AS BIGINT)), i ->
          |  (element_at(g, CAST(i AS INT)) + 2 * element_at(g, CAST(i AS INT) - 1)
          |   + 4 * element_at(g, CAST(i AS INT) - 2)
          |   + 8 * element_at(g, CAST(i AS INT) - 3)) % 16 = 0)
          |END""".stripMargin))
      .withColumn("chunk_ref", expr(
        """filter(
          |  zip_with(
          |    concat(array(0L), bpos),
          |    concat(bpos, array(CAST(size(t) AS BIGINT))),
          |    (s, e) -> IF(e > s,
          |      concat_ws(' ', slice(t, CAST(s AS INT) + 1, CAST(e - s AS INT))),
          |      CAST(NULL AS STRING))),
          |  c -> c IS NOT NULL)""".stripMargin))
      .select(col("doc_id"), col("chunk_ref"))
    val diff = graft.ext.Dedup.cdcChunkArrays(docs)
      .join(chain, "doc_id")
      .filter(col("chunk") =!= col("chunk_ref"))
    assert(diff.count() == 0, "codegen'd chunker must equal the reference chain")
  }

  test("cdcClean: keep-first removal — copies empty, owners and uniques intact") {
    import spark.implicits._
    import graft.ext.Dedup
    val toks = (0 until 150).map(i => s"v${(i * 40503L) % 89}")
    val a = toks.mkString(" ")                       // owner
    val b = a                                        // exact copy → cleaned to ''
    val c = toks.map(t => t + "x").mkString(" ")     // unique → untouched
    val out = Dedup.cdcClean(
        Seq((10L, a), (20L, b), (30L, c)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(10L)._2 == 0 && out(10L)._3 == a,
      s"owner keeps everything: ${out(10L)}")
    assert(out(20L)._1 == 0 && out(20L)._3 == "",
      s"exact copy loses every chunk: ${out(20L)}")
    assert(out(30L)._2 == 0 && out(30L)._3 == c,
      s"unique doc untouched: ${out(30L)}")
  }

  test("text_hybrid_rrf: fusion favors docs on BOTH lists; integer-monotone") {
    val rows = SparkEntry.queries("text_hybrid_rrf")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      s"rrf must be non-increasing: ${rows.toSeq}")
    // a doc on both top-20 lists scores at least 2·⌊10⁶/80⌋; one-list docs
    // cap at ⌊10⁶/61⌋ — the head of the fused list must beat the one-list cap
    val oneListCap = 1000000L / 61L
    assert(rows.head._2 > oneListCap,
      s"head ${rows.head} must sit on both lists (> $oneListCap)")
  }

  test("text_bm25_topk: probe doc ranks, scores monotone, plan is keyed") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val df = SparkEntry.queries("text_bm25_topk")(spark, sf)
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.nonEmpty && rows.length <= 10)
      assert(rows.exists(_._1 == 0L), s"doc 0 contains every query term: $rows")
      assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
        s"scores must be non-increasing: $rows")
      assert(rows.forall(_._2 > 0L), s"query-term docs must score > 0: $rows")
      val p = df.queryExecution.executedPlan
      assert(p.collect { case c: CartesianProductExec => c }.isEmpty, s"$p")
      assert(p.collect { case w: WindowExec => w }.isEmpty,
        s"top-k must be TakeOrdered, not a window:\n$p")
    }
  }
}
