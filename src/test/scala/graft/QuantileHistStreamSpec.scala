package graft

import graft.streaming.QuantileHistStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantile-histogram stream: bucket contract vs the batch SQL expression,
  * batch==stream parity under micro-batch splits, order independence,
  * relative-error bound of the decoded quantile. */
class QuantileHistStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bucketOf/lowerOf match the batch key's SQL expressions bit for bit") {
    val vals = Seq(0.0000001, 0.0000319, 0.0000321, 0.03, 1.0, 2.5, 327.53,
      31.999999, 32.000001) ++ (1 to 50).map(i => i * 0.77)
    val sql = vals.toDF("value")
      .select(greatest(lit(1L), floor(col("value") * 1000000).cast("long")).as("vq"))
      .withColumn("e", (length(bin(col("vq"))) - 1).cast("long"))
      .select(expr(
        "CASE WHEN vq < 32 THEN vq ELSE 16*e + (shiftright(vq, CAST(e-4 AS INT)) & 15) END"))
      .as[Long].collect()
    assert(sql.toSeq == vals.map(v => QuantileHistStream.bucketOf(v).toLong),
      "stream bucket code must equal the batch SQL bucket code")
    val lowers = vals.map(v => QuantileHistStream.bucketOf(v))
      .map(b => b.toLong -> QuantileHistStream.lowerOf(b))
    val sqlLower = lowers.map(_._1).toDF("b")
      .select(expr(
        "CASE WHEN b < 32 THEN b ELSE shiftleft(16 + b % 16, CAST(b div 16 - 4 AS INT)) END"))
      .as[Long].collect()
    assert(sqlLower.toSeq == lowers.map(_._2),
      "stream lower-bound decode must equal the batch SQL decode")
  }

  test("stream over micro-batches == the batch key on the same rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = graft.queries.Synth.events(spark, sf)
      .select(col("event_type"), col("value"))
      .collect().map(r => QuantileHistStream.Obs(r.getString(0), r.getDouble(1)))
    val input = MemoryStream[QuantileHistStream.Obs]
    val q = QuantileHistStream.quantiles(input.toDS())
      .writeStream.format("memory").queryName("qhist")
      .outputMode("update").start()
    try {
      rows.grouped(333).foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("qhist").as[QuantileHistStream.QRow].collect()
        .groupBy(_.group).map { case (g, rs) => rs.last }
        .map(r => (r.group, r.n, r.p50Us, r.p95Us, r.p99Us)).toSet
      val batch = SparkEntry.queries("sketch_quantile_histogram")(spark, sf)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      assert(streamed == batch,
        s"stream must equal batch:\nstream=$streamed\nbatch=$batch")
    } finally q.stop()
  }

  test("histogram state is order-independent") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val vals = (1 to 500).map(i => ((i * 2654435761L) % 32753).toDouble / 100.0)
    def run(vs: Seq[Double]): Map[Int, Long] = {
      val st = TestGroupState.create[QuantileHistStream.Hist](
        Optional.empty[QuantileHistStream.Hist](), GroupStateTimeout.NoTimeout,
        1000L, Optional.empty[Long](), hasTimedOut = false)
      QuantileHistStream.transition("g",
        vs.map(QuantileHistStream.Obs("g", _)).iterator, st).foreach(_ => ())
      st.get.buckets
    }
    assert(run(vals) == run(vals.reverse), "state must not depend on order")
    assert(run(vals) == run(scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle(vals)))
  }

  test("decoded quantile is within 2^-4 relative error of the exact quantile") {
    val vals = (1 to 2000).map(i => ((i * 40503L) % 100000L).toDouble / 317.0)
    val m = vals.foldLeft(Map.empty[Int, Long]) { (acc, v) =>
      val b = QuantileHistStream.bucketOf(v)
      acc.updated(b, acc.getOrElse(b, 0L) + 1L)
    }
    val n = vals.size.toLong
    for (q <- Seq(50, 95, 99)) {
      val est = QuantileHistStream.quantile(m, n, q).toDouble
      val rank = ((q * n + 99) / 100).toInt
      val exact = vals.map(v => math.max(1L, math.floor(v * 1000000d).toLong))
        .sorted.apply(rank - 1).toDouble
      assert(est <= exact && est >= exact * (1.0 - 1.0 / 16.0) - 1,
        s"p$q: est=$est exact=$exact — bucket lower bound must bracket " +
          s"the exact quantile within one 2^-4 bucket")
    }
  }
}
