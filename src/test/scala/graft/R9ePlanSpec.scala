package graft

import graft.ext.Dedup
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 fifth wave: behavior + plan pins for the levenshtein dedup
  * rung, the key-skew profile and the MAD length gate. */
class R9ePlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Materializes `docs` as `<tmp>/documents.parquet` and hands the dir to
    * `f`, so hand-check tests can execute the SHIPPED (SparkSession, dir)
    * keys against a toy corpus instead of re-pasting their SQL — the pasted
    * copy could silently drift from the registered key (r9 advice). */
  private def withToyDocs(docs: org.apache.spark.sql.DataFrame)(
      f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-toy-docs").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    f(dir)
  }

  test("levenshtein pairs: planted single edits caught at head, middle " +
    "and tail interior; disjoint docs never paired") {
    // base < 96 chars so NOTHING is hidden by the signature truncation
    val base = "the quick brown fox jumps over the lazy dog near the old barn door"
    def editAt(s: String, i: Int) = s.substring(0, i) + "x" + s.substring(i + 1)
    val docs = Seq(
      (1L, base), (2L, editAt(base, 40)),      // middle edit
      (3L, editAt(base, 20)),                  // interior, past blockLen=16
      (4L, base + " extra trailing words"),    // length +21: outside maxDist
      (5L, "completely different content with no resemblance at all here"))
      .toDF("doc_id", "text")
    val got = Dedup.levenshteinBlockPairs(docs)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 2L, 1L)), s"middle edit missed: $got")
    assert(got.contains((1L, 3L, 1L)), s"interior edit missed: $got")
    assert(got.contains((2L, 3L, 2L)), s"edit-edit pair missed: $got")
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L),
      s"disjoint doc paired: $got")
    assert(!got.exists(p => p._2 == 4L), s"over-threshold pair kept: $got")
  }

  test("levenshtein pairs: an edit inside the head block still pairs via " +
    "the tail block (two-family recall contract)") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq((1L, base), (2L, "Q" + base.substring(1)))
      .toDF("doc_id", "text")
    val got = Dedup.levenshteinBlockPairs(docs)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 2L, 1L)), s"head edit not caught by tail: $got")
  }

  test("levenshtein pairs: block cap is deterministic and non-binding " +
    "caps change nothing") {
    val c = graft.queries.R9eQueries.levCorpus(spark, sf)
    val a = Dedup.levenshteinBlockPairs(c, maxBlock = 64)
      .as[(Long, Long, Long)].collect().toSet
    val b = Dedup.levenshteinBlockPairs(c, maxBlock = 10000)
      .as[(Long, Long, Long)].collect().toSet
    assert(a.subsetOf(b), "capped pairs must be a subset of uncapped")
    // on the sf0.001 corpus the 64-cap should be non-binding or nearly so
    assert(a == b, s"cap binding at sf0.001: ${b.diff(a).take(3)}")
  }

  test("keep-canonical over lev pairs collapses the planted typo cluster") {
    val docs = Seq(
      (10L, "one two three four five six seven eight nine ten eleven " +
        "twelve thirteen fourteen fifteen sixteen"),
      (11L, "one two three four five six sxven eight nine ten eleven " +
        "twelve thirteen fourteen fifteen sixteen"),
      (20L, "entirely unrelated text body that stands alone as its own " +
        "cluster of exactly one document"))
      .toDF("doc_id", "text")
    val kept = Dedup.keepCanonical(docs,
        Dedup.levenshteinBlockPairs(docs).select("ida", "idb"))
      .as[(Long, Long)].collect().toSet
    assert(kept === Set((10L, 10L), (20L, 20L)), s"got $kept")
  }

  test("lev pairs plan: no cartesian product; the only window partitions " +
    "by the block key") {
    val df = SparkEntry.queries("dedup_levenshtein_block")(spark, sf)
    val p = df.queryExecution.executedPlan
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty)
    val s = df.queryExecution.executedPlan.toString
    val windows = s.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.forall(_.contains("bkey")),
      s"window not partitioned by bkey:\n${windows.mkString("\n")}")
  }

  test("levCorpus id space: organic doc_ids stay below the +300000000 " +
    "planted offset at every local SF") {
    // the pairs_planted predicate (idb − ida == 300000000 && ida % 20 == 0)
    // silently assumes max organic doc_id < 3e8; assert the bound on
    // every corpus a key can run against so a larger SF can't alias
    // planted and organic ids (r9 advice; offsets x100 in r13 for sf300+
    // headroom)
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val maxId = graft.queries.Synth.documents(spark, d)
        .agg(max("doc_id")).as[Long].head()
      assert(maxId < 300000000L,
        s"$d: doc_id space ($maxId) reaches the planted-id offset — " +
          "levCorpus planted ids would alias organic ids")
    }
  }

  test("key-skew profile: planted frequencies") {
    val orders = Seq(1L, 1L, 1L, 2L, 2L, 3L, 4L, 5L)
      .toDF("o_custkey")
    orders.createOrReplaceTempView("graft_r9e_orders")
    val got = spark.sql("""
      WITH f AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS freq
                 FROM graft_r9e_orders GROUP BY 1)
      SELECT freq, CAST(count(*) AS BIGINT) AS n_keys
      FROM f GROUP BY 1 ORDER BY freq""")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L), (2L, 1L), (3L, 1L)))
  }

  test("MAD gate: hand-computed median, MAD and outlier count") {
    // lengths 10,10,12,14,100 → lower-median 12; devs 2,2,0,2,88 →
    // MAD 2; outliers |x−12| > 6 → just 100.
    val docs = Seq((1L, "s", 10L), (2L, "s", 10L), (3L, "s", 12L),
        (4L, "s", 14L), (5L, "s", 100L))
      .toDF("doc_id", "source", "n_chars")
    // execute the SHIPPED key against a toy documents.parquet dir — no
    // pasted SQL copy to drift from the registered statement
    withToyDocs(docs) { dir =>
      val got = graft.queries.R9eQueries.queries("text_mad_outliers")(spark, dir)
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      assert(got === Seq(("s", 5L, 12L, 2L, 1L)), s"got $got")
    }
  }

  test("nprobe curve: one row per operating point, hits monotone " +
    "non-decreasing in nprobe (probing more cells never loses a hit)") {
    val rows = SparkEntry.queries("ann_nprobe_curve")(spark, sf)
      .as[(Long, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(1L, 2L, 4L, 8L))
    assert(rows.map(_._2) == rows.map(_._2).sorted,
      s"recall curve not monotone: $rows")
    assert(rows.last._2 > 0)
  }

  test("textrank: a hub word adjacent to everything outranks leaf words") {
    // docs where 'hub' is adjacent to 6 distinct words ≥3 times each and
    // the leaves only ever touch 'hub' — PR must rank the hub first
    val line = "a hub b hub c hub d hub e hub f hub"
    val docs = Seq((1L, line), (2L, line), (3L, line)).toDF("doc_id", "text")
    docs.createOrReplaceTempView("graft_r9e_trdocs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val toks = docs.select(col("doc_id"),
      posexplode(graft.ext.TextAnalysis.tokens(col("text"))).as(Seq("pos", "w")))
    val adj = toks.withColumn("nxt", lead("w", 1).over(w))
      .filter(col("nxt").isNotNull && col("w") =!= col("nxt"))
      .select(least(col("w"), col("nxt")).as("u"),
        greatest(col("w"), col("nxt")).as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("n")).filter(col("n") >= 3)
    val edges = adj.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(adj.select(col("v").as("src"), col("u").as("dst")))
    val top = graft.queries.GraphQueries.pagerank(spark, edges)
      .orderBy(col("rank_e12").desc, col("node"))
      .as[(String, Long)].collect()
    assert(top.head._1 == "hub", s"hub not top: ${top.take(3).toSeq}")
    assert(top.head._2 > top(1)._2)
  }

  test("kneser-ney: continuation count ranks a many-context word above " +
    "a frequent-but-single-context one ('san francisco' effect)") {
    // 'common' follows 4 distinct contexts once each; 'francisco' follows
    // only 'san' but 4 times. Raw frequency ties (c(.w2)=4); KN's
    // continuation count must give P_cont(common)=4/Ntot > 1/Ntot.
    val docs = Seq(
      (1L, "san francisco san francisco san francisco san francisco"),
      (2L, "a common b common c common d common"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("graft_r9e_kn_docs")
    val rows = spark.sql("""
      WITH toks AS (
        SELECT doc_id, posexplode(split(text, '\\s+')) AS (pos, w)
        FROM graft_r9e_kn_docs),
      big AS (
        SELECT doc_id, w AS w1,
               lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM toks),
      c AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
            FROM big WHERE w2 IS NOT NULL GROUP BY 1, 2),
      cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS ncont FROM c GROUP BY 1)
      SELECT w2, ncont FROM cont WHERE w2 IN ('francisco', 'common')""")
      .as[(String, Long)].collect().toMap
    assert(rows("francisco") == 1L && rows("common") == 4L)
    // and the full key's rational is exact on a hand case: den divides as
    // 4*c1*Ntot with c1 = sum over contexts
    val kn = graft.queries.R9eQueries.queries("text_kneser_ney_bigram")
    val out = kn(spark, sf).collect()
    assert(out.length == 100)
    out.foreach { r =>
      assert(r.getLong(4) > 0 && r.getLong(3) >= 0 && r.getLong(3) <= r.getLong(4),
        s"P outside [0,1]: $r")
    }
  }

  test("lsh band curve: detection monotone non-decreasing in band count " +
    "(narrower bands lower the collision threshold)") {
    val rows = SparkEntry.queries("dedup_lsh_band_curve")(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(2L, 4L, 8L))
    assert(rows.map(_._3) == rows.map(_._3).sorted,
      s"band curve not monotone: $rows")
    assert(rows.forall(r => r._3 <= r._2))
    assert(rows.last._3 > rows.head._3, "curve should actually climb here")
  }

  test("b-bit minhash: identical docs estimate exactly 10000 at every b; " +
    "more bits never raise the mean error on the planted pairs") {
    val rows = SparkEntry.queries("dedup_bbit_minhash")(spark, sf).collect()
    assert(rows.nonEmpty)
    // bias correction sanity: m = 32 (identical sigs) → est = 10000 exact
    rows.filter(_.getLong(1) == 32L).foreach(r => assert(r.getLong(2) == 10000L))
    def mae(estIdx: Int) = rows.map(r =>
      math.abs(r.getLong(estIdx) - r.getLong(7))).sum.toDouble / rows.length
    val (e1, e2, e4) = (mae(2), mae(4), mae(6))
    assert(e1 >= e2 - 1 && e2 >= e4 - 1,
      s"error should shrink with b: $e1 $e2 $e4")
  }

  test("mattr: hand-computed windows; repetitive text scores below " +
    "diverse text of the SAME length (the length-robustness point)") {
    // 26 tokens -> two windows of 25; diverse doc: all distinct
    val diverse = (1 to 26).map(i => s"w$i").mkString(" ")
    // same length, one token repeated throughout
    val repetitive = Seq.fill(26)("dup").mkString(" ")
    val docs = Seq((1L, "s", diverse), (2L, "s", repetitive))
      .toDF("doc_id", "source", "text")
    // execute the SHIPPED key against a toy documents.parquet dir — no
    // pasted SQL copy to drift from the registered statement
    withToyDocs(docs) { dir =>
      val rows = graft.queries.R9eQueries.queries("text_mattr")(spark, dir)
        .select("doc_id", "mattr_x1e6")
        .as[(Long, Long)].collect().toMap
      assert(rows(1L) == 1000000L, s"all-distinct windows must score 1.0: $rows")
      assert(rows(2L) == 40000L, s"1 type per 25-token window = 0.04: $rows")
    }
  }

  test("lev recall counters: every planted typo copy detected at sf0.001") {
    val r = SparkEntry.queries("dedup_lev_recall")(spark, sf).collect()(0)
    val (planted, detected) = (r.getLong(0), r.getLong(1))
    val (pairsTotal, pairsPlanted) = (r.getLong(2), r.getLong(3))
    assert(planted > 0)
    assert(detected == planted,
      s"recall $detected/$planted — a planted single edit escaped both blocks")
    assert(pairsPlanted == planted, "each planted copy pairs with its origin")
    assert(pairsTotal >= pairsPlanted)
  }
}
