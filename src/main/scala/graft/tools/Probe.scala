package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-key optimization probe (guide §1): for each named query key, time
  * planning vs execution separately, count jobs/stages/tasks via a
  * listener, count Exchange nodes in the executed plan, and dump
  * `.explain("formatted")` to plans/<tag>/<key>_<tag>.txt. Measurement
  * tooling only — never on a query path.
  *
  * Usage: runMain graft.tools.Probe <sfDir> <planDir> <tag> <key,key,...>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, planDir, tag, keysCsv) = args.take(4)
    val keys = keysCsv.split(',').map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shuffleRead = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        shuffleRead.addAndGet(sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
      }
    })
    Files.createDirectories(Paths.get(planDir))
    // warm up codegen/JIT so the first key isn't taxed
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val all = graft.SparkEntry.queries
    println(f"${"key"}%-34s planMs  execMs warmMs   jobs stages  tasks shufKB")
    keys.foreach { k =>
      all.get(k) match {
        case None => println(s"$k: NOT FOUND")
        case Some(fn) =>
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
          System.gc()
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val executed = df.queryExecution.executedPlan // forces analysis+planning
          val t1 = System.nanoTime()
          jobs.set(0); stages.set(0); tasks.set(0); shuffleRead.set(0L)
          df.write.format("noop").mode("overwrite").save()
          val t2 = System.nanoTime()
          // warm second execution (fresh plan, codegen cached)
          spark.catalog.clearCache()
          val df2 = fn(spark, sfDir)
          val t3 = System.nanoTime()
          df2.write.format("noop").mode("overwrite").save()
          val t4 = System.nanoTime()
          val (j, st, ta, sh) = (jobs.get, stages.get, tasks.get, shuffleRead.get)
          println(f"$k%-34s ${(t1 - t0) / 1e6}%6.0f  ${(t2 - t1) / 1e6}%6.0f ${(t4 - t3) / 1e6}%6.0f  $j%5d $st%6d $ta%6d ${sh / 1024}%6d")
          Files.writeString(Paths.get(s"$planDir/${k}_$tag.txt"),
            df2.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
          // ALSO dump the WRITE's executed plan: sink-adjacent rewrites
          // (SinkSortLocal) only exist under the write command — the bare
          // df explain above cannot show them
          @volatile var writeQe: Option[
            org.apache.spark.sql.execution.QueryExecution] = None
          val wl = new org.apache.spark.sql.util.QueryExecutionListener {
            override def onSuccess(fn: String,
                qe: org.apache.spark.sql.execution.QueryExecution,
                d: Long): Unit = writeQe = Some(qe)
            override def onFailure(fn: String,
                qe: org.apache.spark.sql.execution.QueryExecution,
                e: Exception): Unit = ()
          }
          spark.listenerManager.register(wl)
          try {
            spark.catalog.clearCache()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            val dl = System.nanoTime() + 10L * 1000000000L
            while (writeQe.isEmpty && System.nanoTime() < dl) Thread.sleep(20)
            writeQe.foreach(qe => Files.writeString(
              Paths.get(s"$planDir/${k}_${tag}_write.txt"),
              qe.explainString(
                org.apache.spark.sql.execution.FormattedMode)))
          } finally spark.listenerManager.unregister(wl)
      }
    }
    spark.stop()
  }
}
