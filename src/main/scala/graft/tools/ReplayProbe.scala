package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: decompose a streaming-replay key's wall time into the
  * query lifecycle phases Spark reports per micro-batch
  * (durationMs: addBatch / getBatch / queryPlanning / walCommit /
  * commitOffsets / triggerExecution), so the bench tail can be attributed
  * to operator cost vs harness cost with receipts (r12 verdict item 7).
  *
  * Usage: runMain graft.tools.ReplayProbe <sfDir>
  */
object ReplayProbe {
  private def probeAttr(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = graft.queries.Synth.eventsTs(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_us"))
      .as[(Long, Long, String, Long)].collect().toSeq
    val clicks = evs.filter(_._3 == "click").map(e => (e._1, e._2, e._4))
    val purchases = evs.filter(_._3 == "purchase").map(e => (e._1, e._2, e._4))
    println(s"[probe] clicks=${clicks.size} purchases=${purchases.size}")
    val (tmin, tmax) = (evs.map(_._4).min, evs.map(_._4).max)
    def tb(ts: Long): Int = // = R11Queries.tercileOf (private[queries])
      if (ts < tmin + (tmax - tmin) / 3) 0
      else if (ts < tmin + 2 * (tmax - tmin) / 3) 1
      else 2
    val cIn = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long)]
    val pIn = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long)]
    val t0 = System.nanoTime()
    val q = graft.streaming.AttributionJoinStream.attribute(
        cIn.toDF().toDF("user_id", "click_id", "ts_us"),
        pIn.toDF().toDF("user_id", "purchase_id", "ts_us"),
        "0 seconds", 3600L * 1000000L)
      .writeStream.format("memory").queryName("probe_attr")
      .outputMode("append").start()
    (0 to 2).foreach { b =>
      val tb0 = System.nanoTime()
      cIn.addData(clicks.filter(e => tb(e._3) == b))
      pIn.addData(purchases.filter(e => tb(e._3) == b))
      q.processAllAvailable()
      println(f"[probe] attr batch$b ${(System.nanoTime() - tb0) / 1e9}%.2f s")
    }
    val tc = System.nanoTime()
    val n = spark.table("probe_attr").count()
    println(f"[probe] attr drain+count ($n%d rows) ${(System.nanoTime() - tc) / 1e9}%.2f s")
    q.recentProgress.foreach { p =>
      println(s"[probe] attr progress batch=${p.batchId} rows=${p.numInputRows} " +
        s"durationMs=${p.durationMs} state=${p.stateOperators.map(so =>
          s"rows=${so.numRowsTotal} updated=${so.numRowsUpdated} ms=${so.allUpdatesTimeMs}/${so.allRemovalsTimeMs}/${so.commitTimeMs}").mkString(";")}")
    }
    println(f"[probe] attr total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    q.stop()
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PROBE_PARTS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.range(1000000).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()

    if (args.length > 1 && args(1) == "attr") { probeAttr(spark, dir); return }
    val base = graft.queries.Synth.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 5 === 0)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val copies = base.filter(_._1 % 10 == 0)
    val wave0 = copies.map { case (id, t) => (id + 1000000L, t) }
    val wave2 = copies.map { case (id, t) => (id + 2000000L, t) }

    val tAll0 = System.nanoTime()
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val tStart0 = System.nanoTime()
    val q = graft.streaming.NearDupStream.candidates(
        graft.streaming.NearDupStream.bucketHits(
          input.toDF().toDF("doc_id", "text").repartition(col("doc_id"))))
      .writeStream.format("memory").queryName("probe_neardup")
      .outputMode("append").start()
    val startS = (System.nanoTime() - tStart0) / 1e9
    val batchSecs = Seq(wave0, base, wave2).zipWithIndex.map { case (b, i) =>
      val t0 = System.nanoTime()
      input.addData(b); q.processAllAvailable()
      (i, b.size, (System.nanoTime() - t0) / 1e9)
    }
    val collectT0 = System.nanoTime()
    val n = spark.table("probe_neardup").count()
    val collectS = (System.nanoTime() - collectT0) / 1e9
    println(f"[probe] start() $startS%.2f s")
    batchSecs.foreach { case (i, sz, t) =>
      println(f"[probe] batch$i ($sz%d rows) $t%.2f s")
    }
    q.recentProgress.foreach { p =>
      val d = p.durationMs
      println(s"[probe] progress batch=${p.batchId} rows=${p.numInputRows} " +
        s"durationMs=${d}")
    }
    println(f"[probe] drain+count ($n%d rows) $collectS%.2f s")
    q.stop()
    println(f"[probe] total ${(System.nanoTime() - tAll0) / 1e9}%.2f s")
    spark.stop()
  }
}
