package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Synth

/** The shared planted-id disjointness guard (r10 verdict item 5, completed
  * r12): EVERY key that plants synthetic rows by offsetting an organic id
  * silently assumes the organic id space stays BELOW its offset — if a
  * larger driver-regenerated SF ever crossed one of the offsets, planted
  * and organic ids would alias and those keys would go wrong silently
  * (both engines replay the same aliased corpus, so the oracle could not
  * catch it; only this spec can).
  *
  * Offset census over src/main (grep `+ [123]0+\b`):
  *   CORPUS-OPS families (run at heavy SFs — sf10/sf30/sf90 rungs):
  *     documents.doc_id  +1e8/+2e8 — ExtQueries.dupCorpus (and the langid
  *                       / cross-source / epoch variants), +3e8 —
  *                       R9eQueries.levCorpus; embeddings.vec_id +1e8 —
  *                       ExtQueries near-dup vectors. Offsets ×100 in r13
  *                       (r12 verdict item 4): organic doc ids reach
  *                       ~1.5M at sf30 and had ALIASED the old +1e6/+2e6
  *                       plantings; 1e8 holds headroom through ~sf2000.
  *   REPLAY twins (run only at local SFs ≤ 0.1, ids ≤ ~60k):
  *     documents.doc_id  +1e6/+2e6 — R10Queries waves (:52, :115),
  *                       R11dQueries waves (:57); embeddings.vec_id +1e6
  *                       — R11gQueries wave (:81). Kept at 1e6: their
  *                       pinned micro-batch schedules derive from the ids
  *                       and they never run at heavy SFs; the local-SF
  *                       assertion below still guards them.
  *
  * The binding bounds: 1e6 at local SFs (replay waves), 1e8 at heavy SFs
  * (corpus ops). (R9ePlanSpec keeps its levCorpus-specific assertion;
  * this spec is the one place the global invariant lives.)
  */
class IdSpaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  /** Smallest offset used by the replay twins (local SFs only). */
  private val MinOffset = 1000000L
  /** Smallest offset used by the heavy-SF corpus-ops families. */
  private val HeavyOffset = 100000000L

  test("documents.doc_id stays below every planting offset at every " +
    "local SF") {
    for (d <- sfDirs) {
      val maxId = Synth.documents(spark, d)
        .agg(org.apache.spark.sql.functions.max("doc_id")).as[Long].head()
      assert(maxId >= 0L, s"$d: empty documents table")
      assert(maxId < MinOffset,
        s"$d: max doc_id ($maxId) reaches the smallest planted offset " +
          s"($MinOffset) — +1e6/+2e6/+3e6 plantings would alias organic ids")
    }
  }

  test("heavy-SF corpus-ops offsets hold headroom through sf300") {
    // heavy rungs are gitignored and regenerated (scripts/gen_sf*.py);
    // assert on whichever are present, and extrapolate the per-SF id
    // slope to the sf300 rung the offsets must survive
    val heavy = Seq("testdata-sf1" -> 1.0, "testdata-sf10" -> 10.0,
      "testdata-sf30" -> 30.0).filter { case (d, _) =>
      new java.io.File(s"$d/documents.parquet").exists()
    }
    for ((d, sf) <- heavy) {
      val maxId = Synth.documents(spark, d)
        .agg(org.apache.spark.sql.functions.max("doc_id")).as[Long].head()
      assert(maxId < HeavyOffset,
        s"$d: max doc_id ($maxId) reaches the corpus-ops offset")
      val atSf300 = (maxId / sf * 300.0).toLong
      assert(atSf300 < HeavyOffset,
        s"$d: id slope ($maxId at sf$sf → ~$atSf300 at sf300) would " +
          s"alias the +1e8 plantings — raise the offsets again")
    }
  }

  test("embeddings.vec_id stays below every planting offset at every " +
    "local SF") {
    for (d <- sfDirs) {
      val maxId = Synth.embeddings(spark, d)
        .agg(org.apache.spark.sql.functions.max("vec_id")).as[Long].head()
      assert(maxId >= 0L, s"$d: empty embeddings table")
      assert(maxId < MinOffset,
        s"$d: max vec_id ($maxId) reaches the smallest planted offset " +
          s"($MinOffset) — +1e6 planted vectors would alias organic ids")
    }
  }
}
