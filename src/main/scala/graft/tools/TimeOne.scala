package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one query: runMain graft.tools.TimeOne <key> <sfDir> [conf k=v ...] */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val b = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    val withConf = args.drop(2).foldLeft(b) { (acc, kv) =>
      val Array(k, v) = kv.split("=", 2); acc.config(k, v)
    }
    val spark = withConf.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[timeone] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
