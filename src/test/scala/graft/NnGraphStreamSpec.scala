package graft

import graft.ext.Similarity
import graft.streaming.NnGraphStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming k-NN-graph admission: bucket assignment must equal the batch
  * LSH seed, and the at-admission neighbor lists must equal the batch
  * "prefix rule" (exact top-k among same-bucket EARLIER ids) however the
  * stream is micro-batched — plus the retention cap bounds state.
  */
class NnGraphStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val planes = Similarity.hyperplanes(nPlanes = 4, dim = 4)

  private def vecsDf(vs: Seq[(Long, Seq[Double])]) =
    vs.toDF("vec_id", "embedding")

  /** Deterministic pseudo-embeddings: id-seeded, 4-dim. */
  private def synth(n: Int): Seq[(Long, Seq[Double])] =
    (0L until n.toLong).map { id =>
      id -> Seq.tabulate(4)(j => math.sin(id * 7.0 + j * 13.0))
    }

  test("assign matches the batch lshBucket for every vector") {
    val vs = vecsDf(synth(40))
    val streaming = NnGraphStream.assign(vs, planes)
      .collect().map(a => a.vec_id -> a.bucket).toMap
    val batch = vs.select(col("vec_id"),
        Similarity.lshBucket(col("embedding"), planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streaming == batch)
  }

  test("streamed admission neighbors == batch prefix rule across scrambled batches") {
    val vs = synth(40)
    // batch prefix rule: per vector, exact top-3 (cos desc, id) among
    // same-bucket vectors with a SMALLER id
    val df = vecsDf(vs)
    val assigned = NnGraphStream.assign(df, planes)
      .collect().map(a => a.vec_id -> ((a.bucket, a.emb))).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = vs.map { case (id, _) =>
      val (bk, emb) = assigned(id)
      id -> assigned.toSeq
        .filter { case (oid, (ob, _)) => oid < id && ob == bk }
        .map { case (oid, (_, oemb)) => (oid, cos(emb, oemb)) }
        .sortBy { case (oid, s) => (-s, oid) }
        .take(3).map(_._1)
    }.toMap

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Double])]
    val dec = NnGraphStream.decisions(
      NnGraphStream.assign(input.toDF().toDF("vec_id", "embedding"), planes), k = 3)
    val q = dec.writeStream.format("memory").queryName("nngraph")
      .outputMode("append").start()
    try {
      // ascending id batches of uneven size — the admission-order contract
      input.addData(vs.slice(0, 7): _*); q.processAllAvailable()
      input.addData(vs.slice(7, 25): _*); q.processAllAvailable()
      input.addData(vs.slice(25, 40): _*); q.processAllAvailable()
      val got = spark.table("nngraph").as[NnGraphStream.Neighbors]
        .collect().map(n => n.vec_id -> n.n_ids.toSeq).toMap
      assert(got == expected,
        s"streamed at-admission neighbors must equal the batch prefix rule\n" +
          s"got:      ${got.toSeq.sortBy(_._1)}\nexpected: ${expected.toSeq.sortBy(_._1)}")
    } finally q.stop()
  }

  test("retention cap: neighbors come only from the retained window") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // all four vectors share a bucket by construction: identical direction
    val same = Seq(
      1L -> Seq(1.0, 0.5, 0.25, 0.125), 2L -> Seq(1.0, 0.5, 0.25, 0.125),
      3L -> Seq(1.0, 0.5, 0.25, 0.125), 4L -> Seq(1.0, 0.5, 0.25, 0.125))
    val input = MemoryStream[(Long, Seq[Double])]
    val dec = NnGraphStream.decisions(
      NnGraphStream.assign(input.toDF().toDF("vec_id", "embedding"), planes),
      k = 3, maxPerBucket = 1)
    val q = dec.writeStream.format("memory").queryName("nngraphcap")
      .outputMode("append").start()
    try {
      input.addData(same: _*); q.processAllAvailable()
      val got = spark.table("nngraphcap").as[NnGraphStream.Neighbors]
        .collect().map(n => n.vec_id -> n.n_ids.toSeq).toMap
      // at cap 1 each arrival sees ONLY its immediate predecessor
      assert(got == Map(1L -> Seq(), 2L -> Seq(1L), 3L -> Seq(2L), 4L -> Seq(3L)),
        s"cap=1 must keep exactly the newest member: $got")
    } finally q.stop()
  }
}
