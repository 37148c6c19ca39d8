package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object HashBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 2000000).map(i => s"token_$i").toDF("s")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // warm both
    df.limit(1000).select(call_function("md5_prefix_long", col("s"), lit(1), lit(13))).write.format("noop").mode("overwrite").save()
    df.limit(1000).select(conv(substring(md5(col("s")),1,13),16,10).cast("long")).write.format("noop").mode("overwrite").save()
    time("old conv chain x2M")(
      df.select(conv(substring(md5(col("s")),1,13),16,10).cast("long").as("h"))
        .write.format("noop").mode("overwrite").save())
    time("md5_prefix_long x2M")(
      df.select(call_function("md5_prefix_long", col("s"), lit(1), lit(13)).as("h"))
        .write.format("noop").mode("overwrite").save())
    time("old conv chain 2 halves x2M")(
      df.select((conv(substring(md5(col("s")),1,15),16,10).cast("long")%1000000007L).as("a"),
        (conv(substring(md5(col("s")),17,15),16,10).cast("long")%1000000007L).as("b"))
        .write.format("noop").mode("overwrite").save())
    time("md5_prefix_long 2 halves x2M")(
      df.select((call_function("md5_prefix_long", col("s"), lit(1), lit(15))%1000000007L).as("a"),
        (call_function("md5_prefix_long", col("s"), lit(17), lit(15))%1000000007L).as("b"))
        .write.format("noop").mode("overwrite").save())
    val chk = df.limit(50000).select(
      call_function("md5_prefix_long", col("s"), lit(1), lit(13)).as("f"),
      conv(substring(md5(col("s")),1,13),16,10).cast("long").as("r"))
      .filter(col("f") =!= col("r")).count()
    println(s"mismatches: $chk")
    spark.stop()
  }
}
