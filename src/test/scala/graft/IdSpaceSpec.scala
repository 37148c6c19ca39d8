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
  * Offset census over src/main (grep `+ [123]000000`):
  *   documents.doc_id  +1e6/+2e6 — ExtQueries.dupCorpus (and the langid /
  *                     cross-source / epoch variants at ExtQueries:196,
  *                     703, 1051, 1205), R10Queries replay waves (:52,
  *                     :115), R11dQueries replay waves (:57);
  *                     +3e6 — R9eQueries.levCorpus (:35).
  *   embeddings.vec_id +1e6 — ExtQueries near-dup vectors (:120, :140,
  *                     :208), R11gQueries replay wave (:81).
  *
  * The binding bound is therefore the SMALLEST offset per table: 1e6 for
  * both. (R9ePlanSpec keeps its levCorpus-specific < 3e6 assertion; this
  * spec is the one place the global invariant lives.)
  */
class IdSpaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  /** The smallest planting offset used anywhere in src/main. */
  private val MinOffset = 1000000L

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
