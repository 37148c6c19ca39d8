package graft

import graft.streaming.RegressionStream
import graft.streaming.RegressionStream.{RegState, XY}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming per-key OLS sufficient statistics: integer state must
  * reproduce the batch q_regression_stats derived columns EXACTLY under
  * any micro-batch split — the bivariate mergeable-moments guarantee. */
class RegressionStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("advance is merge-order-independent (integer sums)") {
    val pts = Seq((3L, 7L), (-2L, 5L), (10L, -1L), (0L, 0L), (4L, 4L))
    val zero = RegState(0, 0, 0, 0, 0, 0)
    val whole = RegressionStream.advance(zero, pts)
    val split = RegressionStream.advance(
      RegressionStream.advance(zero, pts.take(2)), pts.drop(2))
    val reversed = RegressionStream.advance(zero, pts.reverse)
    assert(whole == split && whole == reversed)
    assert(whole.n == 5 && whole.sxy == 3 * 7 - 2 * 5 - 10 + 16)
  }

  test("streamed num/denx/deny equal the batch q_regression_stats exactly") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val all = graft.queries.Synth.lineitem(spark, sf)
      .select(col("l_returnflag").as("key"),
        expr("CAST(floor(l_quantity + 0.5D) AS BIGINT)").as("x"),
        expr("CAST(floor(l_discount * 100D + 0.5D) AS BIGINT)").as("y"))
      .as[XY].collect()
    val input = MemoryStream[XY]
    val q = RegressionStream.regress(input.toDS())
      .writeStream.format("memory").queryName("reg_live")
      .outputMode("update").start()
    try {
      // three scrambled micro-batches
      val shuffled = all.zipWithIndex.sortBy { case (p, i) =>
        (i * 2654435761L + p.x) % 1000003 }.map(_._1)
      val (b1, rest) = shuffled.splitAt(shuffled.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      input.addData(b3.toSeq); q.processAllAvailable()
      val streamed = spark.table("reg_live").collect().zipWithIndex
        .groupBy(_._1.getString(0))
        .map { case (k, rs) =>
          val r = rs.maxBy(_._2)._1
          k -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        }
      // the batch key emits (flag, n, slope, corr_r); re-derive its exact
      // integer num/denx/deny from the same inputs to compare pre-double
      val batch = all.groupBy(_.key).map { case (k, ps) =>
        val s = RegressionStream.advance(RegState(0, 0, 0, 0, 0, 0),
          ps.map(p => (p.x, p.y)).toSeq)
        val row = RegressionStream.rowOf(k, s)
        k -> ((row.n, row.num, row.denx, row.deny))
      }
      assert(streamed == batch)
      // and the doubles the batch KEY publishes match the re-entry rule
      val batchKey = SparkEntry.queries("q_regression_stats")(spark, sf)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      streamed.foreach { case (k, (n, num, denx, _)) =>
        val (bn, bslope) = batchKey(k)
        assert(n == bn)
        val slope = if (denx == 0) 0.0 else num.toDouble / denx.toDouble
        assert(slope == bslope, s"slope mismatch for $k")
      }
    } finally q.stop()
  }
}
