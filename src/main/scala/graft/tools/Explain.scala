package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.tools.Explain <queryKey> [sfDir]` prints
  * the formatted physical plan of one SparkEntry query — the feedback loop
  * for shuffle/pushdown/codegen review (build brief: iterate on .explain).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    if (sys.env.get("SPARK_GRAFT_EXPLAIN_RUN").contains("1")) {
      // execute THIS QueryExecution, then print the AQE-final physical plan
      // (a .write would re-plan under a fresh execution and show the
      // initial adaptive plan instead)
      val n = df.collect().length
      println(s"rows=$n")
      println(df.queryExecution.executedPlan.toString)
    } else df.explain("formatted")
    spark.stop()
  }
}
