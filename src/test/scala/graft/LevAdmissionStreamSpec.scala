package graft

import graft.ext.Dedup
import graft.streaming.LevAdmissionStream
import graft.streaming.LevAdmissionStream.{BlockHit, Member}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming edit-distance admission dedup: the online twin of the
  * levenshtein block rung — star-population parity with batch
  * keep-canonical, pinned chain divergence, bounded state. */
class LevAdmissionStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("banded levenshtein: exact within the band, -1 beyond it") {
    import LevAdmissionStream.levenshtein
    assert(levenshtein("kitten", "sitting", 4) == 3)
    assert(levenshtein("abc", "abc", 4) == 0)
    assert(levenshtein("abc", "xyzabcdefg", 4) == -1) // Δlen 7 > 4
    assert(levenshtein("aaaaaaaaaa", "bbbbbbbbbb", 4) == -1) // dist 10
    assert(levenshtein("abcdefgh", "abxdefgh", 1) == 1)
  }

  test("admitBlock: first doc admitted, single edit rejected to the " +
    "lowest canonical, state capped") {
    val sig = "alpha beta gamma delta epsilon zeta"
    val hits = Seq(
      BlockHit("p:x", 1L, sig.length.toLong, sig),
      BlockHit("p:x", 2L, sig.length.toLong, sig.replace('m', 'x')),
      BlockHit("p:x", 3L, sig.length.toLong, "totally different words here"))
    val (vs, ms) = LevAdmissionStream.admitBlock(Seq.empty, hits, 4L, 64)
    assert(vs.map(v => (v.doc_id, v.canonical)) ==
      Seq((1L, -1L), (2L, 1L), (3L, -1L)))
    assert(ms.map(_.doc_id) == Seq(1L, 3L)) // the rejected doc 2 not admitted
    // cap: a full block admits nothing new but still emits verdicts
    val (vs2, ms2) = LevAdmissionStream.admitBlock(
      ms.map(m => Member(m.doc_id, m.len, m.sig)),
      Seq(BlockHit("p:x", 9L, 20L, "unrelated fresh text")), 4L, 2)
    assert(vs2.head.canonical == -1L && ms2.size == 2)
  }

  test("streamed admission matches batch keep-canonical on a star " +
    "population across scrambled micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // stars only: each planted copy is a single interior edit of its
    // origin; origins are mutually far apart (distinct word sets)
    def doc(seed: Int): String =
      (0 until 18).map(i => s"w${seed}x$i").mkString(" ")
    val origins = (0 until 8).map(i => (i * 10L, doc(i)))
    val copies = origins.flatMap { case (id, t) =>
      Seq((id + 1, t.substring(0, 30) + "q" + t.substring(31)),
        (id + 2, t.substring(0, 44) + "z" + t.substring(45)))
    }
    val all = (origins ++ copies).map { case (id, t) => (id, t) }
    val docs = all.toDF("doc_id", "text")

    val batchKept = Dedup.keepCanonical(docs,
        Dedup.levenshteinBlockPairs(docs).select("ida", "idb"))
      .as[(Long, Long)].collect().toMap

    val hits = LevAdmissionStream.blockHits(docs)
      .collect().sortBy(_.doc_id)
    val input = MemoryStream[BlockHit]
    val q = LevAdmissionStream.verdicts(input.toDS())
      .writeStream.format("memory").queryName("lev_adm")
      .outputMode("append").start()
    try {
      // id-ordered arrival (the ordering contract), 3 micro-batches
      val (b1, rest) = hits.splitAt(hits.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      input.addData(b3.toSeq); q.processAllAvailable()
      val vs = spark.table("lev_adm")
        .as[graft.streaming.LevAdmissionStream.Verdict].collect().toSeq
      val dups = LevAdmissionStream.duplicates(vs)
      val admitted = all.map(_._1).toSet.diff(dups.keySet)
      // batch keepCanonical keeps exactly the admitted set, and every
      // rejected copy names its origin as canonical
      assert(admitted == batchKept.keySet,
        s"admitted=$admitted batch=${batchKept.keySet}")
      dups.foreach { case (id, canon) =>
        assert(canon == (id / 10) * 10, s"copy $id canonical $canon")
      }
    } finally q.stop()
  }

  test("chain divergence pinned: admission admits the far end of a chain " +
    "that batch CC clusters") {
    // A and B differ by 4 edits; B and C differ by 4 edits placed on
    // OTHER positions, so A vs C is 8 edits — a chain, not a star.
    val base = "m0 m1 m2 m3 m4 m5 m6 m7 m8 m9 n0 n1 n2 n3 n4 n5 n6 n7"
    def edit(s: String, at: Seq[Int]) =
      at.foldLeft(s)((t, i) => t.substring(0, i) + "q" + t.substring(i + 1))
    val a = base
    val b = edit(base, Seq(21, 24, 27, 30))
    val c = edit(b, Seq(33, 36, 39, 42))
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val batchKept = Dedup.keepCanonical(docs,
        Dedup.levenshteinBlockPairs(docs).select("ida", "idb"))
      .as[(Long, Long)].collect().toMap
    assert(batchKept.keySet == Set(1L), s"CC should chain: $batchKept")
    val hits = LevAdmissionStream.blockHits(docs).collect().sortBy(_.doc_id)
    val (vs, _) = hits.groupBy(_.bkey).foldLeft(
      (Seq.empty[graft.streaming.LevAdmissionStream.Verdict], ())) {
      case ((acc, _), (_, hs)) =>
        (acc ++ LevAdmissionStream.admitBlock(Seq.empty, hs.toSeq, 4L, 64)._1, ())
    }
    val dups = LevAdmissionStream.duplicates(vs)
    assert(dups.keySet == Set(2L), s"admission must admit C: $dups")
  }
}
