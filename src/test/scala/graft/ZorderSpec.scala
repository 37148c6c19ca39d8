package graft

import graft.queries.{LayoutQueries, Synth}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering: the interleave math on planted points, and the
  * MEASURED pruning effect — under a day-band predicate the Z-clustered
  * layout must leave most files skippable by their min/max footer stats,
  * where a user-sorted layout leaves every file a candidate.
  */
class ZorderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zvalue interleaves bits (x even positions, y odd)") {
    val r = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("x", "y")
      .select(LayoutQueries.zvalue(col("x"), col("y"), 16).as("z"))
      .as[Long].collect().toSeq
    // (3,5): x=011 → bits 0,2 ; y=101 → bits 1,5 → 1+4+2+32 = 39
    assert(r === Seq(0L, 1L, 2L, 3L, 39L))
  }

  test("rank-normalized z-order prunes a day band; a user sort cannot") {
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val ev = Synth.eventsTs(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"),
        expr("ts_us div 86400000000 % 65536").as("day"))
    // the production discipline: normalize each dim to its RANK range
    // before interleaving — raw bit widths this unbalanced (8-bit users vs
    // 5-bit day offsets) put every coarse cut on user bits and day never
    // prunes. Epoch days sit near 19.7k, so normalization is off the MIN.
    val (maxU, minD, maxD) = ev.agg(max("user_id"), min("day"), max("day"))
      .as[(Long, Long, Long)].collect().head
    val norm = ev
      .withColumn("ub", expr(s"user_id * 16 div ${maxU + 1}"))
      .withColumn("db", expr(s"(day - $minD) * 16 div ${maxD - minD + 1}"))
    def write(df: org.apache.spark.sql.DataFrame, z: org.apache.spark.sql.Column,
        name: String): Unit =
      df.withColumn("z", z).repartitionByRange(8, col("z"), col("event_id"))
        .sortWithinPartitions("z")
        .write.mode("overwrite").parquet(s"$base/$name")
    write(norm, LayoutQueries.zvalue(col("ub"), col("db"), 4), "znorm")
    write(norm, col("user_id"), "linear")

    // candidate files = those whose [min_day, max_day] intersects the band
    // (exactly the footer-stat skipping decision a scan makes)
    def candidates(dir: String, lo: Long, hi: Long): (Long, Long) = {
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("day").as("lo"), max("day").as("hi"))
      (stats.filter(col("hi") >= lo && col("lo") <= hi).count(), stats.count())
    }
    val (nHit, nAll) = candidates(s"$base/znorm", minD + 10, minD + 12)
    val (lHit, lAll) = candidates(s"$base/linear", minD + 10, minD + 12)
    assert(nAll === 8L && lAll === 8L)
    assert(lHit === lAll,
      s"user-sorted layout: every file spans all days → no pruning ($lHit/$lAll)")
    assert(nHit <= nAll / 2,
      s"rank-normalized z must leave ≥ half the files skippable, hit $nHit/$nAll")
  }

  test("raw-width z puts every coarse cut on the wide dim — the narrow dim never prunes") {
    // controlled widths: x spans 12 bits, y spans 4 — x's varying bits sit
    // above ALL of y's in the interleave, so 8 range cuts subdivide x only
    // and every file still spans y's full domain; normalizing both dims to
    // 4 bits restores y pruning. This is WHY engines rank-normalize before
    // z-ordering, pinned as a measured counter-example.
    val base = java.nio.file.Files.createTempDirectory("graft-zraw").toString
    val df = spark.range(4096).select(col("id").as("rid"),
      (col("id") * 2654435761L % 4096).as("x"), (col("id") % 16).as("y"))
    def write(z: org.apache.spark.sql.Column, name: String): Unit =
      df.withColumn("z", z).repartitionByRange(8, col("z"), col("rid"))
        .sortWithinPartitions("z")
        .write.mode("overwrite").parquet(s"$base/$name")
    write(LayoutQueries.zvalue(col("x"), col("y"), 16), "raw")
    write(LayoutQueries.zvalue(expr("x * 16 div 4096"), col("y"), 4), "norm")
    def hits(name: String): Long =
      spark.read.parquet(s"$base/$name")
        .groupBy(input_file_name()).agg(min("y").as("lo"), max("y").as("hi"))
        .filter(col("hi") >= 4 && col("lo") <= 5).count()
    assert(hits("raw") === 8L,
      "raw widths: every file must still span the narrow dim (no pruning)")
    assert(hits("norm") <= 4L,
      s"normalized widths must prune the y band, hit ${hits("norm")}/8")
  }
}
